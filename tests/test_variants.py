"""Model-variant integration tests: frame interpolation, 2D txt2img path,
batched multi-sample sampling, TokenFlow kv-reuse, learnable alpha."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.unet import UNetModel

TINY = dict(
    in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=2,
    transformer_depth=1, context_dim=16,
)


class TestInterpolationVariant:
    @pytest.mark.slow
    def test_first_last_frame_injection(self, rng):
        """ControlledUNetModel3DTV2VInterpolate equivalent: controlnet_img
        runs on first+last frames batched and injects per-position
        (wrappers.py:210-264, controlmodel.py:556-617)."""
        unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **TINY)
        cn = ControlNet2D(hint_channels=3, **TINY)
        cn_img = ControlNet2D(
            hint_channels=4, input_hint_identity=True, no_add_x=True,
            disable_text_ca=True, **TINY,
        )
        net = CCEditNetwork(
            unet=unet, controlnet=cn, controlnet_img=cn_img, interpolate=True
        )
        x = jax.random.normal(rng, (1, 4, 8, 8, 4))
        t = jnp.array([100.0])
        cond = {
            "crossattn": jnp.ones((1, 7, 16)),
            "control_hint": jnp.zeros((1, 4, 64, 64, 3)),
            "interpolate_first_last": jax.random.normal(
                jax.random.PRNGKey(5), (1, 2, 8, 8, 4)
            ),
        }
        params = net.init(jax.random.PRNGKey(0), x, t, cond)
        out = net.apply(params, x, t, cond)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())


class Test2DImagePath:
    def test_txt2img_sampling_2d(self, rng):
        """The sampling_image.py path: plain 2D UNet + CFG + sampler over
        (B, H, W, C) images."""
        from ccedit_tpu.diffusion import (
            DiscreteDenoiser, LegacyDDPMDiscretization, VanillaCFG, make_sampler,
        )

        unet = UNetModel(unet_type="2d", **TINY)
        x = jnp.zeros((2, 8, 8, 4))
        t = jnp.zeros((2,))
        ctx = jnp.zeros((2, 7, 16))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx)

        den = DiscreteDenoiser(scaling="eps")
        guider = VanillaCFG(scale=6.0)
        cond_cat = jnp.concatenate([jnp.zeros((2, 7, 16)), jnp.ones((2, 7, 16))])

        def denoise(xx, sigma):
            sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
            x2, s2 = guider.expand(xx, sv)
            out = den(lambda a, b, c: unet.apply(params, a, b, c), x2, s2, cond_cat)
            return guider.combine(out, sv)

        sampler = make_sampler(
            "euler", discretization=LegacyDDPMDiscretization(), num_steps=3
        )
        out = sampler(denoise, jax.random.normal(rng, (2, 8, 8, 4)), jax.random.PRNGKey(1))
        assert out.shape == (2, 8, 8, 4)
        assert bool(jnp.isfinite(out).all())


class TestBatchedSampling:
    @pytest.mark.slow
    def test_multi_sample_batch_is_batch_parallel(self, rng):
        """BASELINE config 5: num_samples/batch_size sampling batches over the
        leading axis — verify per-sample independence (sample i identical
        whether run in a batch of 4 or alone, given per-sample conditioning
        is identical and noise comes from the same per-call key)."""
        from ccedit_tpu.modules.transformer import SpatialTransformer3D

        st = SpatialTransformer3D(in_channels=32, n_heads=4, d_head=8, context_dim=16)
        x = jax.random.normal(rng, (4, 3, 4, 4, 32))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 16))
        p = st.init(jax.random.PRNGKey(0), x, ctx)
        full = st.apply(p, x, ctx)
        solo = st.apply(p, x[1:2], ctx[1:2])
        np.testing.assert_allclose(
            np.asarray(full[1:2]), np.asarray(solo), atol=1e-5
        )


class TestAttentionVariants:
    def test_kv_reuse_crossframe(self, rng):
        """TokenFlow-style n_times_crossframe_attn_in_self
        (attention.py:414-423): frames attend with kv of every n-th frame."""
        from ccedit_tpu.modules.transformer import CrossAttention

        attn = CrossAttention(query_dim=16, heads=2, dim_head=8)
        x = jax.random.normal(rng, (4, 5, 16))
        p = attn.init(jax.random.PRNGKey(0), x)
        out_reuse = attn.apply(p, x, kv_reuse_every=2)
        # frame 1 uses frame 0's kv: equals cross-attn of q1 against x0
        out_manual = attn.apply(p, x[1:2], context=x[0:1])
        np.testing.assert_allclose(
            np.asarray(out_reuse[1:2]), np.asarray(out_manual), atol=1e-5
        )

    def test_learnable_alpha_initializes_to_identity_blend(self, rng):
        from ccedit_tpu.modules.transformer import SpatialTransformer3D

        st = SpatialTransformer3D(
            in_channels=32, n_heads=4, d_head=8, context_dim=16,
            use_learnable_alpha=True,
        )
        x = jax.random.normal(rng, (1, 2, 4, 4, 32))
        ctx = jnp.zeros((1, 7, 16))
        p = st.init(jax.random.PRNGKey(0), x, ctx)
        import flax

        flat = flax.traverse_util.flatten_dict(p["params"])
        assert any(k[-1] == "alpha_temporal" for k in flat)
        out = st.apply(p, x, ctx)
        assert out.shape == x.shape


class TestSSNBlock:
    def test_ssn_scale_shift_and_inject(self, rng):
        from ccedit_tpu.modules.blocks import ResBlock3D

        blk = ResBlock3D(channels=32, emb_channels=32, ssn=True)
        x = jax.random.normal(rng, (1, 2, 8, 8, 32))
        emb = jnp.zeros((1, 32))
        img_emb = jnp.ones((1, 64))  # (scale, shift) per channel
        p = blk.init(jax.random.PRNGKey(0), x, emb, img_emb)
        # un-zero the zero-init out conv so the modulated branch is visible
        import flax

        flat = flax.traverse_util.flatten_dict(p["params"])
        for k in flat:
            if k[0] == "out_conv" and k[-1] == "kernel":
                flat[k] = jnp.ones_like(flat[k]) * 0.01
        p = {"params": flax.traverse_util.unflatten_dict(flat)}
        out, inject = blk.apply(p, x, emb, img_emb, return_inject=True)
        assert out.shape == x.shape and inject.shape == x.shape
        out_noimg = blk.apply(p, x, emb, None)
        assert not np.allclose(np.asarray(out), np.asarray(out_noimg))


class TestControlNet3D:
    def test_pseudo3d_taps(self, rng):
        from ccedit_tpu.modules.controlnet import ControlNet3D

        cn = ControlNet3D(hint_channels=4, **TINY)
        x = jnp.ones((1, 3, 8, 8, 4))
        hint = jnp.ones((1, 3, 8, 8, 4))  # latent-resolution hint
        t = jnp.array([10.0])
        ctx = jnp.ones((1, 7, 16))
        p = cn.init(jax.random.PRNGKey(0), x, hint, t, ctx)
        taps = cn.apply(p, x, hint, t, ctx)
        assert len(taps) == 5
        assert taps[0].shape == (1, 3, 8, 8, 32)
        assert taps[-1].shape == (1, 3, 4, 4, 64)
        for tap in taps:  # zero-init everywhere
            np.testing.assert_allclose(np.asarray(tap), 0.0, atol=1e-6)


class TestRAIG:
    def test_2d_reference_attention_network(self, rng):
        from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D

        unet = UNetModel(unet_type="2d", enable_ref_attn=True, **TINY)
        cn_img = ControlNet2D(
            hint_channels=4, input_hint_identity=True, no_add_x=True,
            disable_text_ca=True, **TINY,
        )
        net = CCEditNetwork(unet=unet, controlnet_img=cn_img, raig=True)
        x = jax.random.normal(rng, (2, 8, 8, 4))
        t = jnp.array([100.0, 200.0])
        cond = {
            "crossattn": jnp.ones((2, 7, 16)),
            "cond_feat": jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4)),
        }
        p = net.init(jax.random.PRNGKey(0), x, t, cond)
        out = net.apply(p, x, t, cond)
        assert out.shape == x.shape
        # different reference image must not change output at init (zero-init
        # proj_out_ca) but must after un-zeroing
        cond2 = dict(cond, cond_feat=jnp.zeros((2, 8, 8, 4)))
        out2 = net.apply(p, x, t, cond2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


class TestRAIGMapping:
    def test_reproduces_sd15_table(self):
        from ccedit_tpu.modules.controlnet import raig_ref_mapping

        mapping = raig_ref_mapping((1, 2, 4, 4), 2, (4, 2, 1))
        assert mapping == (0, 1, 2, 3, 4, 5, 6, 5, 5, 4, 3, 3, 2, 1, 1, 0)


class TestRemat:
    @pytest.mark.slow
    def test_remat_unet_grad_matches_shapes(self, rng):
        """use_remat (the reference's use_checkpoint) must not change params
        or outputs; gradients flow."""
        unet_a = UNetModel(unet_type="pseudo-3d", use_remat=False, **TINY)
        unet_b = UNetModel(unet_type="pseudo-3d", use_remat=True, **TINY)
        x = jax.random.normal(rng, (1, 2, 8, 8, 4))
        t = jnp.array([100.0])
        ctx = jnp.ones((1, 7, 16))
        pa = unet_a.init(jax.random.PRNGKey(0), x, t, ctx)
        pb = unet_b.init(jax.random.PRNGKey(0), x, t, ctx)
        assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
        oa = unet_a.apply(pa, x, t, ctx)
        ob = unet_b.apply(pb, x, t, ctx)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-5)

        def loss(p):
            return jnp.sum(unet_b.apply(p, x, t, ctx) ** 2)

        g = jax.grad(loss)(pb)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)

    @pytest.mark.slow
    def test_remat_policy_same_math(self, rng):
        """remat_policy (TPU-only knob: jax.checkpoint_policies name) selects
        WHAT the remat'd blocks save — it must not change outputs or
        gradients, only the fwd/bwd memory-recompute trade."""
        unet_a = UNetModel(unet_type="pseudo-3d", use_remat=True, **TINY)
        unet_b = UNetModel(
            unet_type="pseudo-3d", use_remat=True,
            remat_policy="dots_with_no_batch_dims_saveable", **TINY)
        x = jax.random.normal(rng, (1, 2, 8, 8, 4))
        t = jnp.array([100.0])
        ctx = jnp.ones((1, 7, 16))
        pa = unet_a.init(jax.random.PRNGKey(0), x, t, ctx)
        pb = unet_b.init(jax.random.PRNGKey(0), x, t, ctx)
        assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
        np.testing.assert_allclose(
            np.asarray(unet_a.apply(pa, x, t, ctx)),
            np.asarray(unet_b.apply(pb, x, t, ctx)), atol=1e-5)

        def loss(params, net):
            return jnp.sum(net.apply(params, x, t, ctx) ** 2)

        ga = jax.grad(loss)(pa, unet_a)
        gb = jax.grad(loss)(pb, unet_b)
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-4, rtol=1e-4)

    def test_remat_policy_via_config(self):
        """use_checkpoint + remat_policy plumb through the YAML key map for
        both the UNet and the ControlNet branch."""
        from ccedit_tpu.config import build_network

        tiny = {k: list(v) if isinstance(v, tuple) else v
                for k, v in TINY.items()}
        cfg = {"target": "UNetModel3D", "params": {
            **tiny, "use_checkpoint": True,
            "remat_policy": "dots_with_no_batch_dims_saveable",
            "controlnet_config": {"target": "ControlNet2D", "params": {
                **tiny, "hint_channels": 3, "use_checkpoint": True,
                "remat_policy": "dots_with_no_batch_dims_saveable"}}}}
        net = build_network(cfg)
        assert net.unet.use_remat
        assert net.unet.remat_policy == "dots_with_no_batch_dims_saveable"
        assert net.controlnet.remat_policy == "dots_with_no_batch_dims_saveable"


class TestControlNet3DDisableTemporal:
    def test_center_frame_taps(self, rng):
        from ccedit_tpu.modules.controlnet import ControlNet3D

        cn = ControlNet3D(hint_channels=4, disable_temporal=True, **TINY)
        x = jax.random.normal(rng, (1, 5, 8, 8, 4))
        hint = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8, 8, 4))
        t = jnp.array([10.0])
        ctx = jnp.ones((1, 7, 16))
        p = cn.init(jax.random.PRNGKey(0), x, hint, t, ctx)
        taps = cn.apply(p, x, hint, t, ctx)
        assert taps[0].shape == (1, 8, 8, 32)  # 2D center-frame maps
        assert taps[-1].shape == (1, 4, 4, 64)
        # only the center frame matters: perturbing other frames is a no-op
        x2 = x.at[:, 0].set(0.0).at[:, -1].set(123.0)
        hint2 = hint.at[:, 1].set(-5.0)
        taps2 = cn.apply(p, x2, hint2, t, ctx)
        for a, b in zip(taps, taps2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
