"""Numerical parity: reference PyTorch networks vs our flax networks with
converted weights — the golden oracle for both the network re-implementation
and the checkpoint converter (SURVEY.md §7.3 hard part #1).

Torch models are built at tiny config, weights randomized (so zero-init
temporal layers become active), converted with ccedit_tpu.io, and outputs
compared elementwise.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import install_reference, randomize_state_dict  # noqa: E402

from ccedit_tpu.io.torch_convert import (  # noqa: E402
    convert_clip,
    convert_controlnet,
    convert_unet,
    convert_vae,
)

TINY = dict(
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=[2, 1],
    channel_mult=[1, 2],
    num_heads=2,
    transformer_depth=1,
    context_dim=16,
)
CONV_KW = dict(
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_resolutions=(2, 1),
    transformer_depth=1,
    model_channels=32,
)


def _to_np(t):
    return t.detach().cpu().numpy()


def _sd_np(model):
    return {k: _to_np(v) for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def sgm():
    return install_reference()


class TestUNet2DParity:
    def test_forward_matches(self, sgm):
        import jax.numpy as jnp

        from ccedit_tpu.modules.unet import UNetModel

        from sgm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

        tm = TorchUNet(
            use_checkpoint=False, use_spatial_transformer=True, legacy=False,
            **TINY,
        ).eval()
        randomize_state_dict(tm, seed=1)

        x = torch.randn(2, 4, 8, 8, generator=torch.Generator().manual_seed(2))
        t = torch.tensor([3.0, 977.0])
        ctx = torch.randn(2, 7, 16, generator=torch.Generator().manual_seed(3))
        with torch.no_grad():
            ref = _to_np(tm(x, timesteps=t, context=ctx))

        params = convert_unet(_sd_np(tm), prefix="", video=False, **CONV_KW)
        jm = UNetModel(unet_type="2d", **{**TINY, "attention_resolutions": (2, 1),
                                          "channel_mult": (1, 2)})
        out = jm.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 1)),
            jnp.asarray(_to_np(t)),
            jnp.asarray(_to_np(ctx)),
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def _torch_cn_config(hint_channels=3, **extra):
    return {
        "target": "sgm.modules.diffusionmodules.controlmodel.ControlNet2D",
        "params": dict(
            hint_channels=hint_channels, control_scales=1.0,
            use_checkpoint=False, use_spatial_transformer=True, legacy=False,
            **TINY, **extra,
        ),
    }


def _torch_tv2v(sgm, cfca=False, with_img=False, interpolate=False):
    from sgm.modules.diffusionmodules.controlmodel import (
        ControlledUNetModel3DTV2V,
        ControlledUNetModel3DTV2VInterpolate,
    )

    kwargs = dict(
        use_checkpoint=False, use_spatial_transformer=True, legacy=False,
        disable_temporal_text_ca=True, **TINY,
    )
    if cfca:
        kwargs.update(enable_attention3d_crossframe=True, ST3DCA_ca_type="center_self")
    if with_img or interpolate:
        kwargs["controlnet_img_config"] = _torch_cn_config(
            hint_channels=4, no_add_x=True,
            set_input_hint_block_as_identity=True, disable_text_ca=True,
        )
    cls = ControlledUNetModel3DTV2VInterpolate if interpolate else ControlledUNetModel3DTV2V
    tm = cls(controlnet_config=_torch_cn_config(), **kwargs).eval()
    return tm


class TestUNet3DParity:
    def test_bare_unet3d_forward_matches(self, sgm):
        """ControlledUNetModel3DTV2V with control=None == plain UNetModel3D
        path (temporal stem + head, pseudo-3D blocks)."""
        import jax.numpy as jnp

        from ccedit_tpu.modules.unet import UNetModel

        tm = _torch_tv2v(sgm)
        randomize_state_dict(tm, seed=4)

        x = torch.randn(1, 4, 3, 8, 8, generator=torch.Generator().manual_seed(5))
        t = torch.tensor([500.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(6))
        with torch.no_grad():
            ref = _to_np(tm(x, timesteps=t, context=ctx))  # (B,C,T,H,W)

        sd = {k: v for k, v in _sd_np(tm).items() if not k.startswith("controlnet")}
        params = convert_unet(sd, prefix="", video=True, **CONV_KW)
        jm = UNetModel(
            unet_type="pseudo-3d", disable_temporal_text_ca=True,
            **{**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)},
        )
        out = jm.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 4, 1)),  # BCTHW->BTHWC
            jnp.asarray(_to_np(t)),
            jnp.asarray(_to_np(ctx)),
        )
        out = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)

    def test_full_tv2v_wrapper_matches(self, sgm):
        """Full TV2V path: hint inversion + structure ControlNet + decoder
        injection — torch OpenAIWrapperControlLDM3DTV2V vs CCEditNetwork."""
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
        from ccedit_tpu.modules.unet import UNetModel

        from sgm.modules.diffusionmodules.wrappers import OpenAIWrapperControlLDM3DTV2V

        tm = _torch_tv2v(sgm)
        randomize_state_dict(tm, seed=20)
        wrapper = OpenAIWrapperControlLDM3DTV2V(tm)

        x = torch.randn(1, 4, 3, 8, 8, generator=torch.Generator().manual_seed(21))
        t = torch.tensor([123.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(22))
        hint = torch.rand(1, 3, 3, 64, 64, generator=torch.Generator().manual_seed(23)) * 2 - 1
        with torch.no_grad():
            ref = _to_np(wrapper(x, t, {"crossattn": ctx, "control_hint": hint}))

        sd = _sd_np(tm)
        unet_sd = {k: v for k, v in sd.items() if not k.startswith("controlnet")}
        tiny_kw = {**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)}
        net = CCEditNetwork(
            unet=UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **tiny_kw),
            controlnet=ControlNet2D(hint_channels=3, **tiny_kw),
        )
        params = {
            "unet": convert_unet(unet_sd, prefix="", video=True, **CONV_KW),
            "controlnet": convert_controlnet(sd, prefix="controlnet.", **CONV_KW),
        }
        cond = {
            "crossattn": jnp.asarray(_to_np(ctx)),
            "control_hint": jnp.asarray(_to_np(hint).transpose(0, 2, 3, 4, 1)),
        }
        out = net.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 4, 1)),
            jnp.asarray(_to_np(t)),
            cond,
        )
        out = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)

    def test_full_tvi2v_cfca_matches(self, sgm):
        """TVI2V: appearance branch on the center frame + CFCA attention."""
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
        from ccedit_tpu.modules.unet import UNetModel

        from sgm.modules.diffusionmodules.wrappers import OpenAIWrapperControlLDM3DTV2V

        tm = _torch_tv2v(sgm, cfca=True, with_img=True)
        randomize_state_dict(tm, seed=30)
        wrapper = OpenAIWrapperControlLDM3DTV2V(tm)

        x = torch.randn(1, 4, 3, 8, 8, generator=torch.Generator().manual_seed(31))
        t = torch.tensor([42.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(32))
        hint = torch.rand(1, 3, 3, 64, 64, generator=torch.Generator().manual_seed(33)) * 2 - 1
        cond_feat = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(34))
        with torch.no_grad():
            ref = _to_np(
                wrapper(x, t, {"crossattn": ctx, "control_hint": hint, "cond_feat": cond_feat})
            )

        sd = _sd_np(tm)
        unet_sd = {
            k: v for k, v in sd.items() if not k.startswith("controlnet")
        }
        tiny_kw = {**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)}
        net = CCEditNetwork(
            unet=UNetModel(
                unet_type="pseudo-3d", disable_temporal_text_ca=True,
                enable_attention3d_crossframe=True, st3dca_ca_type="center_self",
                **tiny_kw,
            ),
            controlnet=ControlNet2D(hint_channels=3, **tiny_kw),
            controlnet_img=ControlNet2D(
                hint_channels=4, input_hint_identity=True, no_add_x=True,
                disable_text_ca=True, **tiny_kw,
            ),
        )
        params = {
            "unet": convert_unet(unet_sd, prefix="", video=True, cfca=True, **CONV_KW),
            "controlnet": convert_controlnet(
                sd, prefix="controlnet.", **CONV_KW
            ),
            "controlnet_img": convert_controlnet(
                sd, prefix="controlnet_img.", identity_hint=True,
                disable_text_ca=True, **CONV_KW,
            ),
        }
        cond = {
            "crossattn": jnp.asarray(_to_np(ctx)),
            "control_hint": jnp.asarray(_to_np(hint).transpose(0, 2, 3, 4, 1)),
            "cond_feat": jnp.asarray(_to_np(cond_feat).transpose(0, 2, 3, 1)),
        }
        out = net.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 4, 1)),
            jnp.asarray(_to_np(t)),
            cond,
        )
        out = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)

    def test_full_interpolate_wrapper_matches(self, sgm):
        """Frame interpolation: controlnet_img runs on first+last frames
        batched (wrappers.py:210-264) and its taps are added at frames
        0 / -1 of EVERY input block + middle (controlmodel.py:556-617) —
        torch OpenAIWrapperControlLDM3DTV2VInterpolate vs CCEditNetwork
        interpolate=True."""
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
        from ccedit_tpu.modules.unet import UNetModel

        from sgm.modules.diffusionmodules.wrappers import (
            OpenAIWrapperControlLDM3DTV2VInterpolate,
        )

        tm = _torch_tv2v(sgm, interpolate=True)
        randomize_state_dict(tm, seed=70)
        wrapper = OpenAIWrapperControlLDM3DTV2VInterpolate(tm)

        x = torch.randn(1, 4, 3, 8, 8, generator=torch.Generator().manual_seed(71))
        t = torch.tensor([250.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(72))
        hint = torch.rand(1, 3, 3, 64, 64,
                          generator=torch.Generator().manual_seed(73)) * 2 - 1
        # (B, C, 2, H, W): VAE latents of the first and last frame
        ifl = torch.randn(1, 4, 2, 8, 8, generator=torch.Generator().manual_seed(74))
        with torch.no_grad():
            ref = _to_np(wrapper(
                x, t, {"crossattn": ctx, "control_hint": hint,
                       "interpolate_first_last": ifl}))

        sd = _sd_np(tm)
        unet_sd = {k: v for k, v in sd.items() if not k.startswith("controlnet")}
        tiny_kw = {**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)}
        net = CCEditNetwork(
            unet=UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                           **tiny_kw),
            controlnet=ControlNet2D(hint_channels=3, **tiny_kw),
            controlnet_img=ControlNet2D(
                hint_channels=4, input_hint_identity=True, no_add_x=True,
                disable_text_ca=True, **tiny_kw,
            ),
            interpolate=True,
        )
        params = {
            "unet": convert_unet(unet_sd, prefix="", video=True, **CONV_KW),
            "controlnet": convert_controlnet(sd, prefix="controlnet.", **CONV_KW),
            "controlnet_img": convert_controlnet(
                sd, prefix="controlnet_img.", identity_hint=True,
                disable_text_ca=True, **CONV_KW,
            ),
        }
        cond = {
            "crossattn": jnp.asarray(_to_np(ctx)),
            "control_hint": jnp.asarray(_to_np(hint).transpose(0, 2, 3, 4, 1)),
            # (B, C, 2, H, W) -> (B, 2, H, W, C)
            "interpolate_first_last": jnp.asarray(
                _to_np(ifl).transpose(0, 2, 3, 4, 1)),
        }
        out = net.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 4, 1)),
            jnp.asarray(_to_np(t)),
            cond,
        )
        out = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


# SD-1.5's block STRUCTURE (16 UNet STs / 7 ControlNet STs) at tiny widths:
# the reference RAIG mapping is a hardcoded 16-entry table keyed to exactly
# this layout (controlmodel.py:656-676), so the parity test must reproduce it.
SD15_STRUCT = dict(
    in_channels=4, model_channels=32, out_channels=4, num_res_blocks=2,
    attention_resolutions=[4, 2, 1], channel_mult=[1, 2, 4, 4],
    num_heads=2, transformer_depth=1, context_dim=16,
)


class TestRAIGParity:
    @pytest.mark.slow
    def test_raig_wrapper_matches(self, sgm):
        """2D reference-attention image generation: controlnet_img's
        SpatialTransformer outputs are banked (forward hooks in the
        reference; explicit return_attn_bank here) and every UNet
        SpatialTransformerCA attends to its mapped bank entry —
        OpenAIWrapperRAIG + ControlledUNetModel2DRAIG
        (wrappers.py:47-79, controlmodel.py:620-719) vs
        CCEditNetwork(raig=True)."""
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
        from ccedit_tpu.modules.unet import UNetModel

        from sgm.modules.diffusionmodules.controlmodel import (
            ControlledUNetModel2DRAIG,
        )
        from sgm.modules.diffusionmodules.wrappers import OpenAIWrapperRAIG

        cn_cfg = {
            "target": "sgm.modules.diffusionmodules.controlmodel.ControlNet2D",
            "params": dict(
                hint_channels=4, control_scales=1.0, no_add_x=True,
                set_input_hint_block_as_identity=True, disable_text_ca=True,
                use_checkpoint=False, use_spatial_transformer=True,
                legacy=False, **SD15_STRUCT,
            ),
        }
        tm = ControlledUNetModel2DRAIG(
            use_checkpoint=False, use_spatial_transformer=True, legacy=False,
            enable_ref_attn=True, controlnet_img_config=cn_cfg, **SD15_STRUCT,
        ).eval()
        randomize_state_dict(tm, seed=80)  # un-zeroes proj_out_ca: CA is live
        wrapper = OpenAIWrapperRAIG(tm)

        x = torch.randn(1, 4, 16, 16, generator=torch.Generator().manual_seed(81))
        t = torch.tensor([321.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(82))
        cond_feat = torch.randn(
            1, 4, 16, 16, generator=torch.Generator().manual_seed(83))
        with torch.no_grad():
            ref = _to_np(wrapper(
                x, t, {"crossattn": ctx, "cond_feat": cond_feat}))

        sd = _sd_np(tm)
        unet_sd = {k: v for k, v in sd.items() if not k.startswith("controlnet")}
        conv_kw = dict(channel_mult=(1, 2, 4, 4), num_res_blocks=2,
                       attention_resolutions=(4, 2, 1), transformer_depth=1,
                       model_channels=32)
        struct_kw = {**SD15_STRUCT, "attention_resolutions": (4, 2, 1),
                     "channel_mult": (1, 2, 4, 4)}
        net = CCEditNetwork(
            unet=UNetModel(unet_type="2d", enable_ref_attn=True, **struct_kw),
            controlnet_img=ControlNet2D(
                hint_channels=4, input_hint_identity=True, no_add_x=True,
                disable_text_ca=True, **struct_kw,
            ),
            raig=True,
        )
        params = {
            "unet": convert_unet(unet_sd, prefix="", video=False, **conv_kw),
            "controlnet_img": convert_controlnet(
                sd, prefix="controlnet_img.", identity_hint=True,
                disable_text_ca=True, **conv_kw,
            ),
        }
        cond = {
            "crossattn": jnp.asarray(_to_np(ctx)),
            "cond_feat": jnp.asarray(_to_np(cond_feat).transpose(0, 2, 3, 1)),
        }
        out = net.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 1)),
            jnp.asarray(_to_np(t)),
            cond,
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


class TestControlNetParity:
    def test_forward_matches(self, sgm):
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import ControlNet2D

        from sgm.modules.diffusionmodules.controlmodel import ControlNet2D as TorchCN

        tm = TorchCN(
            hint_channels=3, control_scales=1.0, use_checkpoint=False,
            use_spatial_transformer=True, legacy=False, **TINY,
        ).eval()
        randomize_state_dict(tm, seed=7)

        x = torch.randn(2, 4, 8, 8, generator=torch.Generator().manual_seed(8))
        hint = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(9))
        t = torch.tensor([10.0, 700.0])
        ctx = torch.randn(2, 7, 16, generator=torch.Generator().manual_seed(10))
        with torch.no_grad():
            ref = [_to_np(c) for c in tm(x, hint, timesteps=t, context=ctx)]

        params = convert_controlnet(_sd_np(tm), prefix="", **CONV_KW)
        jm = ControlNet2D(
            hint_channels=3,
            **{**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)},
        )
        control = jm.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 1)),
            jnp.asarray(_to_np(hint).transpose(0, 2, 3, 1)),
            jnp.asarray(_to_np(t)),
            jnp.asarray(_to_np(ctx)),
        )
        assert len(control) == len(ref)
        for ours, theirs in zip(control, ref):
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=2e-4, rtol=1e-3
            )


class TestControlNet3DParity:
    def test_forward_matches(self, sgm):
        """Temporal-aware control branch (controlmodel.py:23-190): pseudo-3D
        trunk, stride-1 latent-res hint pyramid broadcast over frames, and
        pseudo-3D zero-conv taps (2D + 1-D temporal twin per scale).
        randomize_state_dict un-zeroes every zero conv and temporal twin, so
        all 14 taps are live through both branches."""
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import ControlNet3D

        from sgm.modules.diffusionmodules.controlmodel import (
            ControlNet3D as TorchCN3D,
        )

        tm = TorchCN3D(
            hint_channels=4, control_scales=1.0,
            use_checkpoint=False, use_spatial_transformer=True, legacy=False,
            disable_temporal_text_ca=True, **TINY,
        ).eval()
        randomize_state_dict(tm, seed=90)

        x = torch.randn(1, 4, 3, 8, 8, generator=torch.Generator().manual_seed(91))
        # latent-res hint, one map broadcast over every frame (controlmodel.py:170-176)
        hint = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(92))
        t = torch.tensor([77.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(93))
        with torch.no_grad():
            ref = [_to_np(c) for c in tm(x, hint, timesteps=t, context=ctx)]

        params = convert_controlnet(_sd_np(tm), prefix="", video=True, **CONV_KW)
        jm = ControlNet3D(
            hint_channels=4, disable_temporal_text_ca=True,
            **{**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)},
        )
        hint_rep = np.repeat(_to_np(hint)[:, None], 3, axis=1)  # (B,T,h,w,C-first)
        outs = jm.apply(
            {"params": params},
            jnp.asarray(_to_np(x).transpose(0, 2, 3, 4, 1)),
            jnp.asarray(hint_rep.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(_to_np(t)),
            jnp.asarray(_to_np(ctx)),
        )
        assert len(outs) == len(ref)
        for o, r in zip(outs, ref):
            np.testing.assert_allclose(
                np.asarray(o).transpose(0, 4, 1, 2, 3), r, atol=5e-4, rtol=1e-3)

    @pytest.mark.slow
    def test_disable_temporal_center_frame_matches(self, sgm):
        """disable_temporal (controlmodel.py:102-190): the reference STRIPS
        every temporal module and runs the center frame only.  Ours keeps the
        zero-init temporal twins (exact no-ops at T=1) and slices the center
        frame — so the converted 2D-only weights are overlaid on a zero-init
        tree and the outputs must match the stripped torch model."""
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.modules.controlnet import ControlNet3D

        from sgm.modules.diffusionmodules.controlmodel import (
            ControlNet3D as TorchCN3D,
        )

        tm = TorchCN3D(
            hint_channels=4, control_scales=1.0, disable_temporal=True,
            use_checkpoint=False, use_spatial_transformer=True, legacy=False,
            disable_temporal_text_ca=True, **TINY,
        ).eval()
        randomize_state_dict(tm, seed=94)

        x = torch.randn(1, 4, 3, 8, 8, generator=torch.Generator().manual_seed(95))
        hint = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(96))
        t = torch.tensor([510.0])
        ctx = torch.randn(1, 7, 16, generator=torch.Generator().manual_seed(97))
        with torch.no_grad():
            ref = [_to_np(c) for c in tm(x, hint, timesteps=t, context=ctx)]

        # the stripped state dict has NO temporal keys -> convert as 2D and
        # overlay on the zero-init (no-op-twin) tree
        params2d = convert_controlnet(_sd_np(tm), prefix="", video=False, **CONV_KW)
        jm = ControlNet3D(
            hint_channels=4, disable_temporal=True, disable_temporal_text_ca=True,
            **{**TINY, "attention_resolutions": (2, 1), "channel_mult": (1, 2)},
        )
        jx = jnp.asarray(_to_np(x).transpose(0, 2, 3, 4, 1))
        jh = jnp.asarray(_to_np(hint).transpose(0, 2, 3, 1))
        jt = jnp.asarray(_to_np(t))
        jc = jnp.asarray(_to_np(ctx))
        init = jm.init(jax.random.PRNGKey(0), jx, jh, jt, jc)["params"]

        def overlay(base, upd):
            out = dict(base)
            for k, v in upd.items():
                out[k] = overlay(base[k], v) if isinstance(v, dict) else v
            return out

        outs = jm.apply({"params": overlay(init, params2d)}, jx, jh, jt, jc)
        assert len(outs) == len(ref)
        for o, r in zip(outs, ref):  # ours: center map (B,h,w,C); ref: (B,C,1,H,W)
            np.testing.assert_allclose(
                np.asarray(o).transpose(0, 3, 1, 2), r[:, :, 0], atol=5e-4, rtol=1e-3)


class TestVAEParity:
    def test_encode_decode_match(self, sgm):
        import jax.numpy as jnp

        from ccedit_tpu.modules.vae import AutoencoderKL

        from sgm.modules.diffusionmodules.model import Decoder as TDec, Encoder as TEnc

        ddconfig = dict(
            double_z=True, z_channels=4, resolution=32, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0,
        )
        tenc = TEnc(**ddconfig).eval()
        tdec = TDec(**ddconfig).eval()
        tq = torch.nn.Conv2d(8, 8, 1)
        tpq = torch.nn.Conv2d(4, 4, 1)
        for m, seed in ((tenc, 11), (tdec, 12), (tq, 13), (tpq, 14)):
            randomize_state_dict(m, seed=seed)

        x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(15))
        with torch.no_grad():
            moments_ref = _to_np(tq(tenc(x)))
            z = torch.randn(2, 4, 4, 4, generator=torch.Generator().manual_seed(16))
            dec_ref = _to_np(tdec(tpq(z)))

        sd = {}
        sd.update({f"first_stage_model.encoder.{k}": _to_np(v) for k, v in tenc.state_dict().items()})
        sd.update({f"first_stage_model.decoder.{k}": _to_np(v) for k, v in tdec.state_dict().items()})
        sd.update({f"first_stage_model.quant_conv.{k}": _to_np(v) for k, v in tq.state_dict().items()})
        sd.update({f"first_stage_model.post_quant_conv.{k}": _to_np(v) for k, v in tpq.state_dict().items()})
        params = convert_vae(sd, ch_mult=(1, 2), num_res_blocks=1)

        vae = AutoencoderKL(
            embed_dim=4, ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
        )
        moments = vae.apply(
            {"params": params}, jnp.asarray(_to_np(x).transpose(0, 2, 3, 1)),
            method=AutoencoderKL.encode_moments,
        )
        np.testing.assert_allclose(
            np.asarray(moments).transpose(0, 3, 1, 2), moments_ref, atol=2e-4, rtol=1e-3
        )
        dec = vae.apply(
            {"params": params}, jnp.asarray(_to_np(z).transpose(0, 2, 3, 1)),
            method=AutoencoderKL.decode,
        )
        np.testing.assert_allclose(
            np.asarray(dec).transpose(0, 3, 1, 2), dec_ref, atol=2e-4, rtol=1e-3
        )


class TestCLIPParity:
    def test_text_encoder_matches_hf(self):
        import jax.numpy as jnp

        from transformers import CLIPTextConfig, CLIPTextModel as HFCLIP

        from ccedit_tpu.modules.clip import CLIPTextModel

        cfg = CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
        )
        hf = HFCLIP(cfg).eval()
        randomize_state_dict(hf, seed=17)

        tokens = torch.randint(1, 999, (2, 77), generator=torch.Generator().manual_seed(18))
        tokens[:, -1] = 999
        with torch.no_grad():
            ref = _to_np(hf(input_ids=tokens).last_hidden_state)

        sd = {f"transformer.{k}": _to_np(v) for k, v in hf.state_dict().items()}
        params = convert_clip(sd, prefix="transformer.", layers=2)
        jm = CLIPTextModel(vocab_size=1000, width=64, heads=4, layers=2)
        out = jm.apply({"params": params}, jnp.asarray(_to_np(tokens)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
