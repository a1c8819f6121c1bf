#!/usr/bin/env python
"""Per-component timing of one network evaluation at the headline bench shape.

Times (on the real chip):
  * flash attention at the three spatial sizes (6144/1536/384 tokens)
  * temporal attention (17 tokens, huge batch)
  * full CCEditNetwork NFE, UNet alone, ControlNet alone
  * VAE decode
  * GroupNorm microbench at level-0 activation size

Prints one line per measurement: name, ms, and (where known) the bf16 MXU
roofline ms, so the efficiency gap is visible per op.  Used to decide where
round-2 perf work goes (VERDICT.md Weak #5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PEAK_TFLOPS = 197.0  # v5e bf16


def bench(name, fn, *args, flops=None, n=5, iters=20):
    """Time `iters` data-dependent repetitions inside ONE jitted program —
    host-side per-call timing is unreliable under the axon RPC tunnel."""

    def looped(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            # keep the dependence chain (and defeat DCE): fold a data-dependent
            # epsilon of the output back into the next iteration's input
            return carry + (1e-12 * jnp.mean(out)).astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, a[0])

    def sync(r):
        # block_until_ready is a NO-OP under the axon RPC tunnel; fetching a
        # scalar slice of the result is the only reliable device sync
        jax.device_get(jnp.ravel(r)[0])

    fn_j = jax.jit(looped)
    sync(fn_j(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    # subtract the RPC round-trip floor measured by an empty sync
    ms = min(ts) * 1e3 / iters
    roof = f" roofline={flops / PEAK_TFLOPS / 1e9:.2f}ms eff={flops / PEAK_TFLOPS / 1e9 / ms * 100:.0f}%" if flops else ""
    print(f"{name:44s} {ms:9.2f} ms{roof}", flush=True)
    return ms


def attn_flops(b, h, n, d):
    return 4.0 * b * h * n * n * d


def main():
    which = set(sys.argv[1:]) or {"attn", "net", "vae", "gn"}
    from ccedit_tpu.ops.attention import dot_product_attention

    key = jax.random.PRNGKey(0)

    if "attn" in which:
        for (b, h, n, d) in [(34, 8, 6144, 40), (34, 8, 1536, 80), (34, 8, 384, 160),
                             (12288, 8, 32, 40)]:
            q = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
            bench(f"attn flash ({b},{h},{n},{d})",
                  lambda q: dot_product_attention(q, q, q), q,
                  flops=attn_flops(b, h, n, d))
            if n <= 2048:
                bench(f"attn xla   ({b},{h},{n},{d})",
                      lambda q: dot_product_attention(q, q, q, force_xla=True), q,
                      flops=attn_flops(b, h, n, d))
        # head-folded variant: 8 heads of 40 -> 1 head of 320 is NOT the same
        # math; instead try d padded to 64 (valid: zero-pad k/q contraction)
        b, h, n, d = 34, 8, 6144, 40
        q = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)

        def padded(q):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 24)))
            return dot_product_attention(qp, qp, qp, scale=float(d) ** -0.5)[..., :40]
        bench("attn flash d40->64 padded", padded, q, flops=attn_flops(b, h, n, d))

    if "gn" in which:
        import flax.linen as nn
        x = jax.random.normal(key, (34, 64, 96, 320), jnp.bfloat16)
        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
        p = gn.init(key, x)
        bench("groupnorm32+silu (34,64,96,320)",
              lambda x, p: jax.nn.silu(gn.apply(p, x)), x, p)
        w = jax.random.normal(key, (3, 3, 320, 320), jnp.bfloat16)
        bench("conv3x3 320->320 (34,64,96)",
              lambda x, w: jax.lax.conv_general_dilated(
                  x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                  preferred_element_type=jnp.float32),
              x, w, flops=2.0 * 34 * 64 * 96 * 320 * 320 * 9)

    if "net" in which or "vae" in which:
        from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
        from ccedit_tpu.modules.unet import UNetModel
        from ccedit_tpu.modules.vae import AutoencoderKL
        T, H, W = 17, 512, 768
        dtype = jnp.bfloat16
        sd15 = dict(in_channels=4, model_channels=320, out_channels=4,
                    num_res_blocks=2, attention_resolutions=(4, 2, 1),
                    channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                    context_dim=768, dtype=dtype)
        unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **sd15)
        cn = ControlNet2D(hint_channels=3, **sd15)
        net = CCEditNetwork(unet=unet, controlnet=cn)
        x = jnp.zeros((2, T, H // 8, W // 8, 4), jnp.float32)
        tt = jnp.array([500.0, 500.0])
        cond = {"crossattn": jnp.zeros((2, 77, 768), dtype),
                "control_hint": jnp.zeros((2, T, H, W, 3), dtype)}
        p_shapes = jax.eval_shape(net.init, key, x, tt, cond)
        params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), p_shapes)
        if "net" in which:
            bench("full NFE (CFG batch 2, 17f 512x768)",
                  lambda x, p, c: net.apply(p, x, tt, c), x, params, cond,
                  n=2, iters=3)
        if "vae" in which:
            vae = AutoencoderKL(dtype=dtype)
            z = jnp.zeros((17, H // 8, W // 8, 4), jnp.float32)
            v_shapes = jax.eval_shape(
                lambda k, z: vae.init(k, z, method=AutoencoderKL.decode), key, z)
            vp = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v_shapes)
            bench("VAE decode 17f 512x768",
                  lambda z, vp: vae.apply(vp, z, method=AutoencoderKL.decode),
                  z, vp, n=2, iters=3)


if __name__ == "__main__":
    main()
