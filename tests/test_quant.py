"""int8 W8A8 opt-in path (ops/quant.py).

Two contracts:
  1. With quantization DISABLED (the shipped default), QConv/QDense are
     bit-identical to nn.Conv/nn.Dense with the same params — the swap-in
     cannot perturb the exact bf16 path or the torch-parity pins.
  2. With quantization ENABLED, outputs stay close (cosine) and the param
     tree is unchanged (checkpoint converters see no difference).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccedit_tpu.ops import quant
from ccedit_tpu.ops.quant import QConv, QDense, int8_conv, int8_matmul


@pytest.fixture(autouse=True)
def _exact_default():
    quant.set_quantized_matmul(False)
    yield
    quant.set_quantized_matmul(False)


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


CONV_CASES = [
    # (kernel_size, strides, padding, x_shape) — every QConv call-site shape
    ((3, 3), None, "SAME", (2, 8, 12, 16)),
    ((3, 3), (2, 2), ((1, 1), (1, 1)), (2, 8, 12, 16)),
    ((1, 1), None, "SAME", (2, 8, 12, 16)),
    ((1,), None, "SAME", (6, 5, 16)),  # 1D temporal projection
]


@pytest.mark.parametrize("ksize,strides,padding,xshape", CONV_CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_qconv_disabled_bitwise_matches_nn_conv(rng, ksize, strides, padding,
                                                xshape, dtype):
    x = jax.random.normal(rng, xshape, jnp.float32)
    ref = nn.Conv(24, ksize, strides=strides, padding=padding, dtype=dtype)
    q = QConv(24, ksize, strides=strides, padding=padding, dtype=dtype)
    p_ref = ref.init(rng, x)
    p_q = q.init(rng, x)
    # identical param trees (same names, shapes, and init values)
    chex = jax.tree_util.tree_structure
    assert chex(p_ref) == chex(p_q)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_ref = ref.apply(p_ref, x)
    out_q = q.apply(p_ref, x)
    assert out_ref.dtype == out_q.dtype
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_q))


@pytest.mark.parametrize("use_bias", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_qdense_disabled_bitwise_matches_nn_dense(rng, use_bias, dtype):
    x = jax.random.normal(rng, (4, 7, 32), jnp.float32)
    ref = nn.Dense(24, use_bias=use_bias, dtype=dtype)
    q = QDense(24, use_bias=use_bias, dtype=dtype)
    p_ref = ref.init(rng, x)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(q.init(rng, x)))
    np.testing.assert_array_equal(
        np.asarray(ref.apply(p_ref, x)), np.asarray(q.apply(p_ref, x)))


def test_int8_matmul_accuracy(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (3, 64, 96), jnp.float32)
    w = jax.random.normal(k2, (96, 128), jnp.float32) * 0.05
    exact = x @ w
    q = int8_matmul(x, w)
    assert cosine(exact, q) > 0.9995


def test_int8_conv_accuracy(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (2, 16, 16, 32), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 32, 48), jnp.float32) * 0.05
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    exact = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
    q = int8_conv(x, w, (1, 1), "SAME", dn)
    assert cosine(exact, q) > 0.999


def test_int8_zero_weights_are_safe(rng):
    """bench.py materializes params as zeros; scale must not become 0/0."""
    x = jax.random.normal(rng, (2, 8, 8, 16), jnp.float32)
    w = jnp.zeros((3, 3, 16, 16), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = int8_conv(x, w, (1, 1), "SAME", dn)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) == 0)
    out2 = int8_matmul(jnp.zeros((4, 16)), jnp.zeros((16, 8)))
    assert np.all(np.asarray(out2) == 0)


def test_quantized_resblock3d_close_to_exact(rng):
    """Composite check on a real block: enabling the flag re-routes every
    spatial conv through int8 and stays close to the exact output."""
    from ccedit_tpu.modules.blocks import ResBlock3D

    blk = ResBlock3D(channels=32, emb_channels=64, out_channels=64)
    x = jax.random.normal(rng, (1, 3, 8, 8, 32), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 64), jnp.float32)
    params = blk.init(rng, x, emb)
    exact = blk.apply(params, x, emb)
    try:
        quant.set_quantized_matmul(True)
        qout = blk.apply(params, x, emb)
    finally:
        quant.set_quantized_matmul(False)
    assert qout.shape == exact.shape
    assert cosine(exact, qout) > 0.995
    # and the exact path is restored after the flag flips back
    np.testing.assert_array_equal(np.asarray(blk.apply(params, x, emb)),
                                  np.asarray(exact))


def test_quantized_transformer_block_close_to_exact(rng):
    from ccedit_tpu.modules.transformer import BasicTransformerBlock

    blk = BasicTransformerBlock(dim=64, n_heads=4, d_head=16, context_dim=32)
    x = jax.random.normal(rng, (2, 24, 64), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32), jnp.float32)
    params = blk.init(rng, x, ctx)
    exact = blk.apply(params, x, ctx)
    try:
        quant.set_quantized_matmul(True)
        qout = blk.apply(params, x, ctx)
    finally:
        quant.set_quantized_matmul(False)
    assert cosine(exact, qout) > 0.99


@pytest.mark.slow
def test_quantized_full_network_close_to_exact(rng):
    """End-to-end int8 dispatch through the whole CCEditNetwork (UNet +
    ControlNet hint pyramid + temporal convs + every dense/conv call site)
    at tiny geometry, with BOTH flags the CCEDIT_INT8 umbrella sets (W8A8
    matmul/conv + int8 QK^T attention): the denoiser output must stay
    directionally intact, and flipping the flags back must restore the
    exact path bit-for-bit.  (On the CPU suite the QK^T flag exercises the
    dispatch plumbing only — the kv-resident kernel is TPU-gated, so the
    arithmetic difference here comes from the W8A8 path; the quantized
    kernel arithmetic itself is pinned in test_spatial_attention.py via
    interpret mode.)  Geometry is the smallest that still hits every call
    site — this is the slowest test in the file (3 untraced full-net
    applies; GroupNorm32 pins model_channels >= 32, so the geometry can't
    shrink further)."""
    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel
    from ccedit_tpu.ops import attention

    tiny = dict(in_channels=4, model_channels=32, out_channels=4,
                num_res_blocks=1, attention_resolutions=(2, 1),
                channel_mult=(1, 2), num_heads=2, transformer_depth=1,
                context_dim=16)
    net = CCEditNetwork(
        unet=UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                       **tiny),
        controlnet=ControlNet2D(hint_channels=3, **tiny),
    )
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (1, 3, 8, 8, 4), jnp.float32)
    tt = jnp.full((1,), 500.0)
    cond = {
        "crossattn": jax.random.normal(k2, (1, 7, 16), jnp.float32),
        "control_hint": jax.random.normal(k3, (1, 3, 64, 64, 3), jnp.float32),
    }
    params = net.init(rng, x, tt, cond)
    # break the zero-init output layers (the network output at init is
    # exactly 0 by the zero-init invariant, which makes cosine meaningless)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.03 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])
    exact = net.apply(params, x, tt, cond)
    assert float(jnp.abs(exact).max()) > 0
    qk_before = attention._QUANT["qk"]
    try:
        quant.set_quantized_matmul(True)
        attention.set_quantized_qk(True)
        qout = net.apply(params, x, tt, cond)
    finally:
        quant.set_quantized_matmul(False)
        attention._QUANT["qk"] = qk_before
    assert qout.shape == exact.shape
    assert np.all(np.isfinite(np.asarray(qout)))
    assert cosine(exact, qout) > 0.99
    np.testing.assert_array_equal(
        np.asarray(net.apply(params, x, tt, cond)), np.asarray(exact))


def test_trainer_refuses_quantized_mode(tmp_path):
    """round() has zero gradient a.e. — training silently breaks, so the
    trainer must refuse to build a train step with quantization on."""
    from ccedit_tpu.train.trainer import assert_exact_arithmetic

    try:
        quant.set_quantized_matmul(True)
        with pytest.raises(RuntimeError):
            assert_exact_arithmetic()
    finally:
        quant.set_quantized_matmul(False)
    assert_exact_arithmetic()  # no raise when exact


def test_trainer_refuses_quantized_qk_attention():
    """QK8 attention would run an int8-approximate FORWARD while its custom
    VJP differentiates the exact recompute — an inconsistent fwd/bwd pair,
    so the trainer guard must cover the attention flag too (not just the
    W8A8 matmul flag)."""
    from ccedit_tpu.ops import attention
    from ccedit_tpu.train.trainer import assert_exact_arithmetic

    qk_before = attention._QUANT["qk"]
    try:
        attention.set_quantized_qk(True)
        with pytest.raises(RuntimeError):
            assert_exact_arithmetic()
    finally:
        attention._QUANT["qk"] = qk_before
    assert_exact_arithmetic()
