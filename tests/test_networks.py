"""Network-structure tests: shapes, the pseudo-3D zero-init invariant, and
ControlNet wiring.

The key CCEdit property (SURVEY.md §2.3): every temporal layer is
zero-initialized, so a freshly-initialized pseudo-3D model applied to a video
computes exactly the 2D model per frame.  The reference has no test for this;
we make it the cornerstone invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccedit_tpu.modules.blocks import ResBlock, ResBlock3D
from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.transformer import SpatialTransformer, SpatialTransformer3D
from ccedit_tpu.modules.unet import UNetModel

TINY = dict(
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(2, 1),
    channel_mult=(1, 2),
    num_heads=2,
    transformer_depth=1,
    context_dim=16,
)


def _init(mod, *args, **kwargs):
    return mod.init(jax.random.PRNGKey(0), *args, **kwargs)


class TestBlocks:
    def test_resblock_2d_shape(self, rng):
        blk = ResBlock(channels=32, emb_channels=64, out_channels=64)
        x = jnp.ones((2, 8, 8, 32))
        emb = jnp.ones((2, 64))
        params = _init(blk, x, emb)
        out = blk.apply(params, x, emb)
        assert out.shape == (2, 8, 8, 64)

    def test_resblock3d_zero_init_equals_2d_per_frame(self, rng):
        """Weight-transplant: copy the 2D block's params into the 3D block's
        spatial slots; at init the temporal twins are zero, so per-frame
        outputs must match exactly."""
        blk2 = ResBlock(channels=32, emb_channels=32, out_channels=64)
        blk3 = ResBlock3D(channels=32, emb_channels=32, out_channels=64)
        x = jax.random.normal(rng, (2, 5, 8, 8, 32))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))

        p3 = _init(blk3, x, emb)
        # build 2D params from the 3D spatial subtree (names coincide)
        p2_names = set(_init(blk2, x[:, 0], emb)["params"].keys())
        p2 = {"params": {k: v for k, v in p3["params"].items() if k in p2_names}}

        out3 = blk3.apply(p3, x, emb)
        for t in range(5):
            out2 = blk2.apply(p2, x[:, t], emb)
            np.testing.assert_allclose(np.asarray(out3[:, t]), np.asarray(out2), atol=1e-5)

    def test_resblock3d_updown(self, rng):
        blk = ResBlock3D(channels=32, emb_channels=32, down=True)
        x = jnp.ones((1, 3, 8, 8, 32))
        emb = jnp.ones((1, 32))
        out = blk.apply(_init(blk, x, emb), x, emb)
        assert out.shape == (1, 3, 4, 4, 32)


class TestTransformers:
    def test_spatial_transformer_shape(self, rng):
        st = SpatialTransformer(in_channels=32, n_heads=4, d_head=8, context_dim=16)
        x = jax.random.normal(rng, (2, 8, 8, 32))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
        out = st.apply(_init(st, x, ctx), x, ctx)
        assert out.shape == x.shape

    @pytest.mark.slow
    def test_st3d_zero_init_equals_2d_per_frame(self, rng):
        st2 = SpatialTransformer(in_channels=32, n_heads=4, d_head=8, context_dim=16)
        st3 = SpatialTransformer3D(in_channels=32, n_heads=4, d_head=8, context_dim=16)
        x = jax.random.normal(rng, (2, 3, 8, 8, 32))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
        p3 = _init(st3, x, ctx)
        p2_names = set(_init(st2, x[:, 0], ctx)["params"].keys())
        p2 = {"params": {k: v for k, v in p3["params"].items() if k in p2_names}}
        out3 = st3.apply(p3, x, ctx)
        for t in range(3):
            out2 = st2.apply(p2, x[:, t], ctx)
            np.testing.assert_allclose(
                np.asarray(out3[:, t]), np.asarray(out2), atol=1e-4
            )

    @pytest.mark.slow
    def test_cfca_shapes_and_ref_context(self, rng):
        from ccedit_tpu.modules.transformer import SpatialTransformer3DCA

        st = SpatialTransformer3DCA(
            in_channels=32, n_heads=4, d_head=8, context_dim=16, ca_type="center_self"
        )
        x = jax.random.normal(rng, (1, 3, 4, 4, 32))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
        p = _init(st, x, ctx)
        out = st.apply(p, x, ctx)
        assert out.shape == x.shape
        ref = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32))
        # zero-init proj_out_temporal_ca => CFCA contributes nothing at init,
        # with or without a reference bank (the CCEdit identity-at-init trick)
        out_ref = st.apply(p, x, ctx, ref_context=ref)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-6)
        # un-zero the CFCA output projection -> the reference bank must matter
        p_live = jax.tree_util.tree_map(lambda v: v, p)
        import flax

        flat = flax.traverse_util.flatten_dict(p_live["params"])
        for k in list(flat):
            if "proj_out_temporal_ca" in k and k[-1] == "kernel":
                flat[k] = jnp.ones_like(flat[k]) * 0.05
        p_live = {"params": flax.traverse_util.unflatten_dict(flat)}
        a = st.apply(p_live, x, ctx)
        b = st.apply(p_live, x, ctx, ref_context=ref)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestUNet:
    def test_unet2d_shape(self, rng):
        unet = UNetModel(unet_type="2d", **TINY)
        x = jnp.ones((1, 8, 8, 4))
        t = jnp.array([500])
        ctx = jnp.ones((1, 7, 16))
        params = _init(unet, x, t, ctx)
        out = unet.apply(params, x, t, ctx)
        assert out.shape == x.shape

    @pytest.mark.slow
    def test_unet3d_zero_init_equals_2d_per_frame(self, rng):
        unet2 = UNetModel(unet_type="2d", **TINY)
        unet3 = UNetModel(unet_type="pseudo-3d", **TINY)
        x = jax.random.normal(rng, (1, 3, 8, 8, 4))
        t = jnp.array([500])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
        p3 = _init(unet3, x, t, ctx)
        p2_names = set(_init(unet2, x[:, 0], t, ctx)["params"].keys())
        p2 = {"params": {k: v for k, v in p3["params"].items() if k in p2_names}}
        out3 = unet3.apply(p3, x, t, ctx)
        for frame in range(3):
            out2 = unet2.apply(p2, x[:, frame], t, ctx)
            np.testing.assert_allclose(
                np.asarray(out3[:, frame]), np.asarray(out2), atol=1e-4
            )

    @pytest.mark.slow
    def test_unet3d_output_head_zero_at_init_is_not_degenerate(self, rng):
        # out_conv is zero-init -> output must be exactly 0 at init (SD convention)
        unet = UNetModel(unet_type="pseudo-3d", **TINY)
        x = jax.random.normal(rng, (1, 2, 16, 16, 4))
        t = jnp.array([1])
        ctx = jnp.zeros((1, 7, 16))
        out = unet.apply(_init(unet, x, t, ctx), x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestControlNet:
    def test_controlnet_tap_count_and_shapes(self, rng):
        cn = ControlNet2D(hint_channels=3, **TINY)
        x = jnp.ones((2, 8, 8, 4))
        hint = jnp.ones((2, 64, 64, 3))  # 8x spatial of latent
        t = jnp.array([10, 10])
        ctx = jnp.ones((2, 7, 16))
        params = _init(cn, x, hint, t, ctx)
        control = cn.apply(params, x, hint, t, ctx)
        # 1 stem + (1 res + 1 down) + 1 res + 1 middle = len(channel_mult)
        # tiny: stem + L0(1 res) + down + L1(1 res) + middle = 5
        assert len(control) == 5
        assert control[0].shape == (2, 8, 8, 32)
        assert control[-1].shape == (2, 4, 4, 64)
        # all zero at init (zero convs)
        for c in control:
            np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-6)

    def test_controlnet_video_fold(self, rng):
        cn = ControlNet2D(hint_channels=3, **TINY)
        x = jnp.ones((1, 3, 8, 8, 4))
        hint = jnp.ones((1, 3, 64, 64, 3))
        t = jnp.array([10])
        ctx = jnp.ones((1, 7, 16))
        params = _init(cn, x, hint, t, ctx)
        control = cn.apply(params, x, hint, t, ctx)
        assert control[0].shape == (1, 3, 8, 8, 32)

    def test_controlnet_identity_hint_no_add_x(self, rng):
        cn = ControlNet2D(
            hint_channels=4, input_hint_identity=True, no_add_x=True,
            disable_text_ca=True, **TINY,
        )
        x = jnp.ones((2, 8, 8, 4))
        hint = jnp.ones((2, 8, 8, 4))  # latent-space hint
        t = jnp.array([10, 10])
        params = _init(cn, x, hint, t, None)
        out = cn.apply(params, x, hint, t, None, return_attn_bank=True)
        control, bank = out
        assert len(control) == 5
        # tiny net: 2 encoder STs + 1 middle ST = 3 banked activations
        assert len(bank) == 3


class TestCCEditNetwork:
    def test_full_tv2v_network(self, rng):
        unet = UNetModel(unet_type="pseudo-3d", **TINY)
        cn = ControlNet2D(hint_channels=3, **TINY)
        net = CCEditNetwork(unet=unet, controlnet=cn)
        x = jnp.ones((1, 3, 8, 8, 4))
        t = jnp.array([100])
        cond = {
            "crossattn": jnp.ones((1, 7, 16)),
            "control_hint": jnp.zeros((1, 3, 64, 64, 3)),
        }
        params = _init(net, x, t, cond)
        out = net.apply(params, x, t, cond)
        assert out.shape == x.shape

    @pytest.mark.slow
    def test_full_tvi2v_network_with_cfca_reference(self, rng):
        unet = UNetModel(
            unet_type="pseudo-3d",
            enable_attention3d_crossframe=True,
            st3dca_ca_type="center_self",
            **TINY,
        )
        cn = ControlNet2D(hint_channels=3, **TINY)
        cn_img = ControlNet2D(
            hint_channels=4, input_hint_identity=True, no_add_x=True,
            disable_text_ca=True, **TINY,
        )
        net = CCEditNetwork(
            unet=unet, controlnet=cn, controlnet_img=cn_img,
            crossframe_type="reference",
        )
        x = jnp.ones((1, 3, 8, 8, 4))
        t = jnp.array([100])
        cond = {
            "crossattn": jnp.ones((1, 7, 16)),
            "control_hint": jnp.zeros((1, 3, 64, 64, 3)),
            "cond_feat": jnp.ones((1, 8, 8, 4)),
        }
        params = _init(net, x, t, cond)
        out = net.apply(params, x, t, cond)
        assert out.shape == x.shape

    def test_precomputed_hint_features_match_raw_hint(self, rng):
        """encode_control_hint + control_hint_features must be bit-identical
        to the raw control_hint path (the pyramid is loop-invariant; hoisting
        it out of the sampling scan must not change the network function)."""
        unet = UNetModel(unet_type="pseudo-3d", **TINY)
        cn = ControlNet2D(hint_channels=3, **TINY)
        net = CCEditNetwork(unet=unet, controlnet=cn)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 8, 4))
        t = jnp.array([100])
        hint = jax.random.uniform(
            jax.random.PRNGKey(2), (1, 3, 64, 64, 3), minval=-1.0, maxval=1.0)
        cond = {
            "crossattn": jnp.ones((1, 7, 16)),
            "control_hint": hint,
        }
        params = _init(net, x, t, cond)
        ref = net.apply(params, x, t, cond)

        feats = net.apply(params, hint,
                          method=CCEditNetwork.encode_control_hint)
        assert feats.shape == (1, 3, 8, 8, TINY["model_channels"])
        cond2 = {"crossattn": cond["crossattn"],
                 "control_hint_features": feats}
        out = net.apply(params, x, t, cond2)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


class TestUNetExtras:
    """openaimodel tail classes (openaimodel.py:1642-1864) + the VAE-file
    full Model (model.py:323-495) — unused by shipped configs; shape and
    zero-init sanity."""

    def test_no_time_unet_ignores_timesteps(self, rng):
        from ccedit_tpu.modules.unet_extras import NoTimeUNetModel

        net = NoTimeUNetModel(unet_type="2d", **TINY)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        cond = jnp.ones((2, 7, 16))
        p = net.init(jax.random.PRNGKey(1), x, jnp.array([5.0, 9.0]), cond)
        a = net.apply(p, x, jnp.array([5.0, 9.0]), cond)
        b = net.apply(p, x, jnp.array([800.0, 3.0]), cond)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_attention_block_zero_init_residual(self):
        from ccedit_tpu.modules.unet_extras import AttentionBlock

        blk = AttentionBlock(channels=64, num_heads=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
        p = blk.init(jax.random.PRNGKey(1), x)
        # proj_out is zero-init -> block starts as identity
        np.testing.assert_array_equal(np.asarray(blk.apply(p, x)), np.asarray(x))

    @pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                      "spatial_v2"])
    def test_encoder_unet_pools(self, pool):
        from ccedit_tpu.modules.unet_extras import EncoderUNetModel

        net = EncoderUNetModel(
            image_size=32, in_channels=3, model_channels=32, out_channels=10,
            num_res_blocks=1, attention_resolutions=(2,),
            channel_mult=(1, 2), num_heads=2,
            num_head_channels=16 if pool == "attention" else -1, pool=pool)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        p = net.init(jax.random.PRNGKey(1), x, jnp.array([10.0, 20.0]))
        out = net.apply(p, x, jnp.array([10.0, 20.0]))
        assert out.shape == (2, 10)
        assert np.isfinite(np.asarray(out)).all()

    def test_vae_full_model_shapes_and_timestep(self):
        from ccedit_tpu.modules.vae import VAEModel

        m = VAEModel(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), in_channels=3, resolution=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        t = jnp.array([3.0, 77.0])
        p = m.init(jax.random.PRNGKey(1), x, t)
        out = m.apply(p, x, t)
        assert out.shape == x.shape
        # timestep-conditioned: different t -> different output
        out2 = m.apply(p, x, jnp.array([500.0, 900.0]))
        assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0

    def test_vae_full_model_no_timestep_with_context(self):
        from ccedit_tpu.modules.vae import VAEModel

        m = VAEModel(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                     in_channels=6, resolution=32, use_timestep=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        ctx = jnp.zeros((1, 32, 32, 3))
        p = m.init(jax.random.PRNGKey(1), x, None, ctx)
        out = m.apply(p, x, None, ctx)
        assert out.shape == (1, 32, 32, 3)
