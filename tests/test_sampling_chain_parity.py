"""Full sampling-CHAIN parity against the reference torch loop.

The network forwards are bit-pinned in test_torch_parity.py; this module pins
the LOOP around them — the one seam those tests cannot catch (round-3 verdict
item 1).  With identical injected noise (init + per-step ancestral draws) the
entire chain must agree:

  * prepare_sampling_loop's sqrt(1+sigma_0^2)   — sampling.py:44-55
  * VanillaCFGTV2V batch-doubling + combine      — guiders.py:8-40,56-67
  * DiscreteDenoiser sigma->idx quantization     — denoiser.py:43-75
  * get_ancestral_step sigma_down/up split       — sampling_utils.py:27-36
  * DPMPP2SAncestralSampler midpoint math        — sampling.py:370-407
  * EulerAncestralSampler                        — sampling.py:360-367
  * DPMPP2MSampler multistep carry               — sampling.py:410-485
  * Heun / Euler EDM chains (EDM rho-schedule)   — sampling.py:326-358
  * LinearMultistepSampler order-4 coefficients  — sampling.py:296-330
  * prior mixing / sdedit / skip-steps entries   — sampling_tv2v.py:364-446
  * inpainting + blending per-step latent blends — sampling.py:207-268

Torch noise is injected via the reference's own ``noise_sampler`` attribute
(sampling.py: AncestralSampler.__init__) replaced with a queue of
pre-generated numpy tensors; the same tensors feed our sampler through
``noise_override`` / ``engine.sample(init_noise=..., loop_noise=...)``.

This harness is also the real-weight golden runner: the moment reference
checkpoints are available, load them through ccedit_tpu.io instead of
randomize_state_dict and the same asserts become end-to-end goldens.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import install_reference, randomize_state_dict  # noqa: E402
from test_torch_parity import CONV_KW, TINY, _sd_np, _to_np, _torch_tv2v  # noqa: E402

from ccedit_tpu.io.torch_convert import convert_controlnet, convert_unet  # noqa: E402

N_STEPS = 8
CFG_SCALE = 5.0
LEGACY = {
    "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
}
GUIDER_TV2V = {
    "target": "sgm.modules.diffusionmodules.guiders.VanillaCFGTV2V",
    "params": {"scale": CFG_SCALE},
}


@pytest.fixture(scope="module")
def sgm():
    return install_reference()


def _make_torch_denoiser(sgm, wrapper):
    """The reference engine's denoiser closure: DiscreteDenoiser(EpsScaling,
    LegacyDDPM table) over the wrapped network (sampling_tv2v.py:366-369)."""
    from sgm.modules.diffusionmodules.denoiser import DiscreteDenoiser

    dd = DiscreteDenoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"
        },
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling"
        },
        num_idx=1000,
        discretization_config=LEGACY,
    )

    def denoiser(x, sigma, c):
        return dd(wrapper, x, sigma, c)

    denoiser.dd = dd  # exposed for the training-loss parity tests
    denoiser.wrapper = wrapper
    return denoiser


@pytest.fixture(scope="module")
def tv2v_pair(sgm):
    """Reference TV2V wrapper + our CCEditNetwork with converted weights."""
    from sgm.modules.diffusionmodules.wrappers import OpenAIWrapperControlLDM3DTV2V

    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    tm = _torch_tv2v(sgm)
    randomize_state_dict(tm, seed=50)
    wrapper = OpenAIWrapperControlLDM3DTV2V(tm)

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
    return _make_torch_denoiser(sgm, wrapper), net, params


@pytest.fixture(scope="module")
def tvi2v_pair(sgm):
    """Reference TVI2V (appearance branch + CFCA) + our converted network."""
    from sgm.modules.diffusionmodules.wrappers import OpenAIWrapperControlLDM3DTV2V

    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    tm = _torch_tv2v(sgm, cfca=True, with_img=True)
    randomize_state_dict(tm, seed=51)
    wrapper = OpenAIWrapperControlLDM3DTV2V(tm)

    sd = _sd_np(tm)
    unet_sd = {k: v for k, v in sd.items() if not k.startswith("controlnet")}
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
        "controlnet": convert_controlnet(sd, prefix="controlnet.", **CONV_KW),
        "controlnet_img": convert_controlnet(
            sd, prefix="controlnet_img.", identity_hint=True,
            disable_text_ca=True, **CONV_KW,
        ),
    }
    return _make_torch_denoiser(sgm, wrapper), net, params


@pytest.fixture(scope="module")
def interp_pair(sgm):
    """Reference Interpolate wrapper (controlnet_img on first+last frames) +
    our converted CCEditNetwork(interpolate=True)."""
    from sgm.modules.diffusionmodules.wrappers import (
        OpenAIWrapperControlLDM3DTV2VInterpolate,
    )

    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    tm = _torch_tv2v(sgm, interpolate=True)
    randomize_state_dict(tm, seed=52)
    wrapper = OpenAIWrapperControlLDM3DTV2VInterpolate(tm)

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
    return _make_torch_denoiser(sgm, wrapper), net, params


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(123)
    return dict(
        x_init=rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32),
        loop_noise=rng.standard_normal((N_STEPS, 1, 4, 3, 8, 8)).astype(np.float32),
        ctx_c=rng.standard_normal((1, 7, 16)).astype(np.float32),
        ctx_u=rng.standard_normal((1, 7, 16)).astype(np.float32),
        hint=(rng.random((1, 3, 3, 64, 64)) * 2 - 1).astype(np.float32),
        cond_feat=rng.standard_normal((1, 4, 8, 8)).astype(np.float32),
        ifl=rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32),
    )


def _run_torch_chain(torch_denoiser, sampler_cls_name, inputs, num_steps,
                     extra_kwargs=None, inject_loop_noise=True,
                     with_cond_feat=False, with_interp=False):
    import sgm.modules.diffusionmodules.sampling as ref_sampling

    cls = getattr(ref_sampling, sampler_cls_name)
    kwargs = dict(
        discretization_config=LEGACY,
        num_steps=num_steps,
        guider_config=GUIDER_TV2V,
        verbose=False,
        device="cpu",
    )
    kwargs.update(extra_kwargs or {})
    sampler = cls(**kwargs)
    if inject_loop_noise:
        queue = [torch.from_numpy(n) for n in inputs["loop_noise"][:num_steps]]
        sampler.noise_sampler = lambda x: queue.pop(0)

    cond = {
        "crossattn": torch.from_numpy(inputs["ctx_c"]),
        "control_hint": torch.from_numpy(inputs["hint"]),
    }
    uc = {
        "crossattn": torch.from_numpy(inputs["ctx_u"]),
        "control_hint": torch.from_numpy(inputs["hint"]).clone(),
    }
    if with_cond_feat:
        # the reference's uc clones cond_img, so uc carries the SAME latent
        # (sampling_tv2v_ref.py:377-388)
        cond["cond_feat"] = torch.from_numpy(inputs["cond_feat"])
        uc["cond_feat"] = torch.from_numpy(inputs["cond_feat"]).clone()
    if with_interp:
        cond["interpolate_first_last"] = torch.from_numpy(inputs["ifl"])
        uc["interpolate_first_last"] = torch.from_numpy(inputs["ifl"]).clone()
    with torch.no_grad():
        out = sampler(
            torch_denoiser, torch.from_numpy(inputs["x_init"]).clone(), cond, uc
        )
    if inject_loop_noise:
        assert not queue, f"{len(queue)} injected noise rows unconsumed"
    return _to_np(out)


def _make_engine(net, sampler):
    from ccedit_tpu.diffusion.denoiser import DiscreteDenoiser
    from ccedit_tpu.diffusion.guidance import VanillaCFG
    from ccedit_tpu.models.engine import CCEditEngine

    return CCEditEngine(
        network=net,
        denoiser=DiscreteDenoiser("eps"),
        sampler=sampler,
        conditioner=None,
        vae=None,
        guider=VanillaCFG(scale=CFG_SCALE),
    )


def _run_jax_chain(net, params, sampler, inputs, num_steps, inject_loop_noise=True,
                   with_cond_feat=False, with_interp=False):
    import jax
    import jax.numpy as jnp

    engine = _make_engine(net, sampler)
    cond = {
        "crossattn": jnp.asarray(inputs["ctx_c"]),
        "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
    }
    uc = {
        "crossattn": jnp.asarray(inputs["ctx_u"]),
        "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
    }
    if with_cond_feat:
        cf = jnp.asarray(inputs["cond_feat"].transpose(0, 2, 3, 1))
        cond["cond_feat"] = cf
        uc["cond_feat"] = cf
    if with_interp:
        ifl = jnp.asarray(inputs["ifl"].transpose(0, 2, 3, 4, 1))
        cond["interpolate_first_last"] = ifl
        uc["interpolate_first_last"] = ifl
    init = inputs["x_init"].transpose(0, 2, 3, 4, 1)  # BCTHW -> BTHWC
    loop = (
        inputs["loop_noise"][:num_steps].transpose(0, 1, 3, 4, 5, 2)
        if inject_loop_noise
        else None
    )
    out = engine.sample(
        {"network": params},
        cond,
        uc,
        shape=init.shape,
        rng=jax.random.PRNGKey(0),
        num_steps=num_steps,
        init_noise=init,
        loop_noise=loop,
    )
    return np.asarray(out).transpose(0, 4, 1, 2, 3)  # back to BCTHW


class TestSamplingChainParity:
    def test_dpmpp2s_ancestral_chain(self, tv2v_pair, inputs):
        """CCEdit's shipped sampler: 8 steps, CFG 5, eta 1 — the flagship chain."""
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        torch_denoiser, net, params = tv2v_pair
        ref = _run_torch_chain(
            torch_denoiser, "DPMPP2SAncestralSampler", inputs, N_STEPS,
            extra_kwargs=dict(eta=1.0, s_noise=1.0),
        )
        ours = _run_jax_chain(
            net, params,
            DPMPP2SAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                eta=1.0, s_noise=1.0,
            ),
            inputs, N_STEPS,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_euler_ancestral_chain(self, tv2v_pair, inputs):
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import EulerAncestralSampler

        torch_denoiser, net, params = tv2v_pair
        ref = _run_torch_chain(
            torch_denoiser, "EulerAncestralSampler", inputs, N_STEPS,
            extra_kwargs=dict(eta=1.0, s_noise=1.0),
        )
        ours = _run_jax_chain(
            net, params,
            EulerAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                eta=1.0, s_noise=1.0,
            ),
            inputs, N_STEPS,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_dpmpp2s_tvi2v_cfca_chain(self, tvi2v_pair, inputs):
        """Flagship creative workflow: appearance branch + CFCA through the
        full DPM++ 2S ancestral loop (fewer steps — the network is ~2x the
        TV2V cost on CPU)."""
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        torch_denoiser, net, params = tvi2v_pair
        steps = 5
        ref = _run_torch_chain(
            torch_denoiser, "DPMPP2SAncestralSampler", inputs, steps,
            extra_kwargs=dict(eta=1.0, s_noise=1.0), with_cond_feat=True,
        )
        ours = _run_jax_chain(
            net, params,
            DPMPP2SAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=steps,
                eta=1.0, s_noise=1.0,
            ),
            inputs, steps, with_cond_feat=True,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_dpmpp2s_interpolate_chain(self, interp_pair, inputs):
        """Frame-interpolation variant through the full loop: VanillaCFGTV2V
        doubles the interpolate_first_last key (guiders.py:56-67) and the
        wrapper re-runs controlnet_img on frames 0/-1 every NFE."""
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        torch_denoiser, net, params = interp_pair
        steps = 5
        ref = _run_torch_chain(
            torch_denoiser, "DPMPP2SAncestralSampler", inputs, steps,
            extra_kwargs=dict(eta=1.0, s_noise=1.0), with_interp=True,
        )
        ours = _run_jax_chain(
            net, params,
            DPMPP2SAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=steps,
                eta=1.0, s_noise=1.0,
            ),
            inputs, steps, with_interp=True,
        )
        # atol matches the forward-parity tests (5e-4): the interpolate taps
        # add two extra float32 injection sites per block, per step
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    def test_dpmpp2m_chain(self, tv2v_pair, inputs):
        """DPM++ 2M draws no loop noise; only the init noise is injected."""
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2MSampler

        torch_denoiser, net, params = tv2v_pair
        ref = _run_torch_chain(
            torch_denoiser, "DPMPP2MSampler", inputs, N_STEPS,
            inject_loop_noise=False,
        )
        ours = _run_jax_chain(
            net, params,
            DPMPP2MSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
            ),
            inputs, N_STEPS, inject_loop_noise=False,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


class TestImagePipelineChainParity:
    """The 2D image pipeline (cli.sampling_image / the reference's txt2img
    path): plain OpenAIWrapper — including its channel-concat branch
    (wrappers.py:28-45) — + plain VanillaCFG / IdentityGuider +
    DiscreteDenoiser + DPM++2S on 4-D latents.  The video chains above never
    touch this engine assembly."""

    N_IMG_STEPS = 6

    @pytest.fixture(scope="class")
    def image_pair(self, sgm):
        from sgm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
        from sgm.modules.diffusionmodules.wrappers import OpenAIWrapper

        from ccedit_tpu.modules.controlnet import CCEditNetwork
        from ccedit_tpu.modules.unet import UNetModel

        kw = {**TINY, "in_channels": 6}  # 4 latent + 2 concat channels
        tm = TorchUNet(use_checkpoint=False, use_spatial_transformer=True,
                       legacy=False, **kw).eval()
        randomize_state_dict(tm, seed=60)
        wrapper = OpenAIWrapper(tm)

        net = CCEditNetwork(unet=UNetModel(
            unet_type="2d",
            **{**kw, "attention_resolutions": (2, 1), "channel_mult": (1, 2)}))
        params = {"unet": convert_unet(_sd_np(tm), prefix="", video=False,
                                       **CONV_KW)}
        return _make_torch_denoiser(sgm, wrapper), net, params

    @pytest.fixture(scope="class")
    def image_inputs(self):
        rng = np.random.default_rng(61)
        return dict(
            x_init=rng.standard_normal((2, 4, 8, 8)).astype(np.float32),
            loop=rng.standard_normal(
                (self.N_IMG_STEPS, 2, 4, 8, 8)).astype(np.float32),
            ctx_c=rng.standard_normal((2, 7, 16)).astype(np.float32),
            ctx_u=rng.standard_normal((2, 7, 16)).astype(np.float32),
            concat=rng.standard_normal((2, 2, 8, 8)).astype(np.float32),
        )

    def _ref_chain(self, torch_denoiser, ii, guider_config, uncond):
        import sgm.modules.diffusionmodules.sampling as ref_sampling

        sampler = ref_sampling.DPMPP2SAncestralSampler(
            discretization_config=LEGACY, num_steps=self.N_IMG_STEPS,
            guider_config=guider_config, eta=1.0, s_noise=1.0,
            verbose=False, device="cpu")
        queue = [torch.from_numpy(n) for n in ii["loop"]]
        sampler.noise_sampler = lambda x: queue.pop(0)
        cond = {"crossattn": torch.from_numpy(ii["ctx_c"]),
                "concat": torch.from_numpy(ii["concat"])}
        uc = ({"crossattn": torch.from_numpy(ii["ctx_u"]),
               "concat": torch.from_numpy(ii["concat"]).clone()}
              if uncond else None)
        with torch.no_grad():
            ref = _to_np(sampler(
                torch_denoiser, torch.from_numpy(ii["x_init"]).clone(),
                cond, uc))
        assert not queue
        return ref

    def _our_chain(self, net, params, ii, uncond):
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        engine = _make_engine(net, DPMPP2SAncestralSampler(
            discretization=LegacyDDPMDiscretization(),
            num_steps=self.N_IMG_STEPS, eta=1.0, s_noise=1.0))
        jc = {"crossattn": jnp.asarray(ii["ctx_c"]),
              "concat": jnp.asarray(ii["concat"].transpose(0, 2, 3, 1))}
        ju = ({"crossattn": jnp.asarray(ii["ctx_u"]),
               "concat": jnp.asarray(ii["concat"].transpose(0, 2, 3, 1))}
              if uncond else None)
        init = ii["x_init"].transpose(0, 2, 3, 1)
        out = engine.sample(
            {"network": params}, jc, ju, shape=init.shape,
            rng=jax.random.PRNGKey(0), num_steps=self.N_IMG_STEPS,
            init_noise=init,
            loop_noise=ii["loop"].transpose(0, 1, 3, 4, 2))
        return np.asarray(out).transpose(0, 3, 1, 2)

    def test_image_concat_cfg_chain(self, image_pair, image_inputs):
        """txt2img with channel-concat conditioning under plain VanillaCFG
        (guiders.py:8-40) — B=2 also exercises the CFG split at batch > 1."""
        torch_denoiser, net, params = image_pair
        ref = self._ref_chain(
            torch_denoiser, image_inputs,
            {"target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
             "params": {"scale": CFG_SCALE}},
            uncond=True)
        ours = self._our_chain(net, params, image_inputs, uncond=True)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_image_identity_guider_chain(self, image_pair, image_inputs):
        """uc=None -> IdentityGuider: single forward per step, no batch
        doubling (guiders.py:43-53; the reference defaults uc to cond)."""
        torch_denoiser, net, params = image_pair
        ref = self._ref_chain(torch_denoiser, image_inputs, None, uncond=False)
        ours = self._our_chain(net, params, image_inputs, uncond=False)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def _install_streamlit_stub():
    """scripts/demo/streamlit_helpers.py (owner of the reference's
    Img2ImgDiscretizationWrapper) imports streamlit + imwatermark and builds a
    watermark embedder at module scope; stub exactly that surface."""
    import sys
    import types

    if "streamlit" not in sys.modules:
        st = types.ModuleType("streamlit")
        st.cache_resource = lambda *a, **k: (lambda f: f)
        sys.modules["streamlit"] = st
    if "imwatermark" not in sys.modules:
        iw = types.ModuleType("imwatermark")

        class WatermarkEncoder:
            def set_watermark(self, *a, **k):
                pass

        iw.WatermarkEncoder = WatermarkEncoder
        sys.modules["imwatermark"] = iw


class TestCreativeWorkflowEntryParity:
    """The three latent-preparation modes the TV2V/TVI2V CLIs layer AROUND
    the sampling loop (sampling_tv2v.py:364-446) — prior mixing, the
    img2img-pruned sdedit schedule, and sampler-level skip-steps — pinned
    against the reference with the same injected noise."""

    def test_prior_mixing_chain(self, tv2v_pair, inputs):
        """prior_type=ref noise mixing: randn = c_x*prior + c_noise*randn
        BEFORE the loop (sampling_tv2v.py:371-376).  c_x=0.3/c_noise=0.9
        exercise both coefficients harder than the shipped 0.03/1.0."""
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        torch_denoiser, net, params = tv2v_pair
        c_x, c_noise = 0.3, 0.9
        rng = np.random.default_rng(321)
        prior = rng.standard_normal(inputs["x_init"].shape).astype(np.float32)

        ref_inputs = dict(inputs)
        ref_inputs["x_init"] = (c_x * prior + c_noise * inputs["x_init"]).astype(
            np.float32
        )
        ref = _run_torch_chain(
            torch_denoiser, "DPMPP2SAncestralSampler", ref_inputs, N_STEPS,
            extra_kwargs=dict(eta=1.0, s_noise=1.0),
        )

        import jax
        import jax.numpy as jnp

        engine = _make_engine(
            net,
            DPMPP2SAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                eta=1.0, s_noise=1.0,
            ),
        )
        cond = {
            "crossattn": jnp.asarray(inputs["ctx_c"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        uc = {
            "crossattn": jnp.asarray(inputs["ctx_u"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        init = inputs["x_init"].transpose(0, 2, 3, 4, 1)
        out = engine.sample(
            {"network": params}, cond, uc, shape=init.shape,
            rng=jax.random.PRNGKey(0), num_steps=N_STEPS,
            x_prior=jnp.asarray(prior.transpose(0, 2, 3, 4, 1)),
            prior_coefficient=c_x, prior_noise_coefficient=c_noise,
            init_noise=init,
            loop_noise=inputs["loop_noise"][:N_STEPS].transpose(0, 1, 3, 4, 5, 2),
        )
        ours = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_sdedit_img2img_pruned_chain(self, tv2v_pair, inputs):
        """sdedit_denoise_strength: the reference wraps the sampler's
        discretization in Img2ImgDiscretizationWrapper (pruned schedule),
        noises the clean latent at the pruned sigma_0 and pre-divides by
        sqrt(1+sigma_0^2) (sampling_tv2v.py:411-446, streamlit_helpers.py:
        212-233).  The reference's OWN wrapper class is the oracle."""
        import sgm.modules.diffusionmodules.sampling as ref_sampling

        from ccedit_tpu.diffusion.discretization import (
            Img2ImgDiscretizationWrapper, LegacyDDPMDiscretization,
        )
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        _install_streamlit_stub()
        from scripts.demo.streamlit_helpers import (
            Img2ImgDiscretizationWrapper as RefImg2Img,
        )

        torch_denoiser, net, params = tv2v_pair
        strength = 0.5
        rng = np.random.default_rng(654)
        z_clean = rng.standard_normal(inputs["x_init"].shape).astype(np.float32)

        # ---- reference: wrap discretization, noise at pruned sigma_0 ----
        sampler = ref_sampling.DPMPP2SAncestralSampler(
            discretization_config=LEGACY, num_steps=N_STEPS,
            guider_config=GUIDER_TV2V, eta=1.0, s_noise=1.0,
            verbose=False, device="cpu",
        )
        sampler.discretization = RefImg2Img(sampler.discretization,
                                            strength=strength)
        sigmas = sampler.discretization(N_STEPS)
        n_exec = len(sigmas) - 1
        assert 0 < n_exec < N_STEPS  # schedule genuinely pruned
        sigma0 = float(sigmas[0])
        queue = [torch.from_numpy(n)
                 for n in inputs["loop_noise"][:n_exec]]
        sampler.noise_sampler = lambda x: queue.pop(0)
        noised = (z_clean + inputs["x_init"] * sigma0) / np.sqrt(
            1.0 + sigma0**2)
        cond = {
            "crossattn": torch.from_numpy(inputs["ctx_c"]),
            "control_hint": torch.from_numpy(inputs["hint"]),
        }
        uc = {
            "crossattn": torch.from_numpy(inputs["ctx_u"]),
            "control_hint": torch.from_numpy(inputs["hint"]).clone(),
        }
        with torch.no_grad():
            ref = _to_np(sampler(
                torch_denoiser,
                torch.from_numpy(noised.astype(np.float32)).clone(), cond, uc,
            ))
        assert not queue

        # ---- ours: engine mode="sdedit" on the same pruned schedule ----
        import jax
        import jax.numpy as jnp

        engine = _make_engine(
            net,
            DPMPP2SAncestralSampler(
                discretization=Img2ImgDiscretizationWrapper(
                    discretization=LegacyDDPMDiscretization(),
                    strength=strength),
                num_steps=N_STEPS, eta=1.0, s_noise=1.0,
            ),
        )
        ours_sigmas = engine.sampler.get_sigmas(N_STEPS)
        np.testing.assert_allclose(ours_sigmas, np.asarray(sigmas, np.float64),
                                   rtol=1e-6)
        jc = {
            "crossattn": jnp.asarray(inputs["ctx_c"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        ju = {
            "crossattn": jnp.asarray(inputs["ctx_u"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        init = inputs["x_init"].transpose(0, 2, 3, 4, 1)
        out = engine.sample(
            {"network": params}, jc, ju, shape=init.shape,
            rng=jax.random.PRNGKey(0), num_steps=N_STEPS,
            mode="sdedit",
            x_prior=jnp.asarray(z_clean.transpose(0, 2, 3, 4, 1)),
            init_noise=init,
            loop_noise=inputs["loop_noise"][:n_exec].transpose(0, 1, 3, 4, 5, 2),
        )
        ours = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_skip_steps_sdedit_chain(self, tv2v_pair, inputs):
        """Sampler-level sdedit (sampling.py:270-293): run only the LAST
        denoise_steps iterations of the full schedule on an already-noised
        input; the reference's noise_sampler is consulted only inside the
        executed steps."""
        import sgm.modules.diffusionmodules.sampling as ref_sampling

        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import DPMPP2SAncestralSampler

        torch_denoiser, net, params = tv2v_pair
        denoise_steps = 3

        sampler = ref_sampling.DPMPP2SAncestralSampler(
            discretization_config=LEGACY, num_steps=N_STEPS,
            guider_config=GUIDER_TV2V, eta=1.0, s_noise=1.0,
            verbose=False, device="cpu",
        )
        queue = [torch.from_numpy(n)
                 for n in inputs["loop_noise"][:denoise_steps]]
        sampler.noise_sampler = lambda x: queue.pop(0)
        cond = {
            "crossattn": torch.from_numpy(inputs["ctx_c"]),
            "control_hint": torch.from_numpy(inputs["hint"]),
        }
        uc = {
            "crossattn": torch.from_numpy(inputs["ctx_u"]),
            "control_hint": torch.from_numpy(inputs["hint"]).clone(),
        }
        with torch.no_grad():
            ref = _to_np(sampler.sdedit(
                denoise_steps, torch_denoiser,
                torch.from_numpy(inputs["x_init"]).clone(), cond, uc,
            ))
        assert not queue

        import jax
        import jax.numpy as jnp

        engine = _make_engine(
            net,
            DPMPP2SAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                eta=1.0, s_noise=1.0,
            ),
        )
        jc = {
            "crossattn": jnp.asarray(inputs["ctx_c"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        ju = {
            "crossattn": jnp.asarray(inputs["ctx_u"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        init = inputs["x_init"].transpose(0, 2, 3, 4, 1)
        out = engine.sample(
            {"network": params}, jc, ju, shape=init.shape,
            rng=jax.random.PRNGKey(0), num_steps=N_STEPS,
            mode="skip_steps", sdedit_steps=denoise_steps,
            x_prior=jnp.asarray(init),
            loop_noise=inputs["loop_noise"][:denoise_steps]
            .transpose(0, 1, 3, 4, 5, 2),
        )
        ours = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


class TestSamplerModeParity:
    """The per-step latent-blending modes and the deterministic sampler tail:
    inpainting and blending (sampling.py:207-268, TWO noise streams per step)
    plus the Heun / Euler-EDM / LMS chains the reference CLI exposes via
    --sampler_name (all deterministic at s_churn=0, their shipped value)."""

    def _torch_cond(self, inputs):
        cond = {
            "crossattn": torch.from_numpy(inputs["ctx_c"]),
            "control_hint": torch.from_numpy(inputs["hint"]),
        }
        uc = {
            "crossattn": torch.from_numpy(inputs["ctx_u"]),
            "control_hint": torch.from_numpy(inputs["hint"]).clone(),
        }
        return cond, uc

    def _jax_cond(self, inputs):
        import jax.numpy as jnp

        cond = {
            "crossattn": jnp.asarray(inputs["ctx_c"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        uc = {
            "crossattn": jnp.asarray(inputs["ctx_u"]),
            "control_hint": jnp.asarray(inputs["hint"].transpose(0, 2, 3, 4, 1)),
        }
        return cond, uc

    def test_inpainting_chain(self, tv2v_pair, inputs):
        """sample_inpainting: per-step x = x*mask + noised(x0)*(1-mask) then
        the ancestral step — the img_orig draw comes from torch.randn_like,
        the ancestral draw from noise_sampler; both streams injected."""
        import sgm.modules.diffusionmodules.sampling as ref_sampling

        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import EulerAncestralSampler

        torch_denoiser, net, params = tv2v_pair
        rng = np.random.default_rng(777)
        x0_clean = rng.standard_normal(inputs["x_init"].shape).astype(np.float32)
        pre_noise = rng.standard_normal(
            (N_STEPS,) + inputs["x_init"].shape).astype(np.float32)
        # spatial half-mask in BCTHW; 1 = generate, 0 = keep x0
        mask_bcthw = np.ones((1, 1, 1, 8, 8), dtype=np.float32)
        mask_bcthw[..., :4] = 0.0

        sampler = ref_sampling.EulerAncestralSampler(
            discretization_config=LEGACY, num_steps=N_STEPS,
            guider_config=GUIDER_TV2V, eta=1.0, s_noise=1.0,
            verbose=False, device="cpu",
        )
        loop_q = [torch.from_numpy(n) for n in inputs["loop_noise"][:N_STEPS]]
        sampler.noise_sampler = lambda x: loop_q.pop(0)
        pre_q = [torch.from_numpy(n) for n in pre_noise]
        cond, uc = self._torch_cond(inputs)
        orig_randn_like = torch.randn_like
        try:
            torch.randn_like = lambda x: pre_q.pop(0)
            with torch.no_grad():
                ref = _to_np(sampler.sample_inpainting(
                    torch_denoiser, torch.from_numpy(inputs["x_init"]).clone(),
                    cond, torch.from_numpy(x0_clean),
                    torch.from_numpy(mask_bcthw), uc=uc,
                ))
        finally:
            torch.randn_like = orig_randn_like
        assert not loop_q and not pre_q

        import jax
        import jax.numpy as jnp

        engine = _make_engine(
            net,
            EulerAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                eta=1.0, s_noise=1.0,
            ),
        )
        jc, ju = self._jax_cond(inputs)
        init = inputs["x_init"].transpose(0, 2, 3, 4, 1)
        tr6 = lambda a: a.transpose(0, 1, 3, 4, 5, 2)
        out = engine.sample(
            {"network": params}, jc, ju, shape=init.shape,
            rng=jax.random.PRNGKey(0), num_steps=N_STEPS,
            init_noise=init,
            inpaint_x0=jnp.asarray(x0_clean.transpose(0, 2, 3, 4, 1)),
            inpaint_mask=jnp.asarray(mask_bcthw.transpose(0, 2, 3, 4, 1)),
            loop_noise={
                "loop": tr6(inputs["loop_noise"][:N_STEPS]),
                "pre": tr6(pre_noise),
            },
        )
        ours = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_blending_chain(self, tv2v_pair, inputs):
        """sampling_blending: the first t//2 frames are re-seeded from the
        noised x0's frames t//2+1: each step (sampling.py:235-268)."""
        import sgm.modules.diffusionmodules.sampling as ref_sampling

        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import EulerAncestralSampler

        torch_denoiser, net, params = tv2v_pair
        rng = np.random.default_rng(888)
        x0_clean = rng.standard_normal(inputs["x_init"].shape).astype(np.float32)
        pre_noise = rng.standard_normal(
            (N_STEPS,) + inputs["x_init"].shape).astype(np.float32)

        sampler = ref_sampling.EulerAncestralSampler(
            discretization_config=LEGACY, num_steps=N_STEPS,
            guider_config=GUIDER_TV2V, eta=1.0, s_noise=1.0,
            verbose=False, device="cpu",
        )
        loop_q = [torch.from_numpy(n) for n in inputs["loop_noise"][:N_STEPS]]
        sampler.noise_sampler = lambda x: loop_q.pop(0)
        pre_q = [torch.from_numpy(n) for n in pre_noise]
        cond, uc = self._torch_cond(inputs)
        orig_randn_like = torch.randn_like
        try:
            torch.randn_like = lambda x: pre_q.pop(0)
            with torch.no_grad():
                ref = _to_np(sampler.sampling_blending(
                    torch_denoiser, torch.from_numpy(inputs["x_init"]).clone(),
                    cond, torch.from_numpy(x0_clean), uc=uc,
                ))
        finally:
            torch.randn_like = orig_randn_like
        assert not loop_q and not pre_q

        import jax
        import jax.numpy as jnp

        engine = _make_engine(
            net,
            EulerAncestralSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                eta=1.0, s_noise=1.0,
            ),
        )
        jc, ju = self._jax_cond(inputs)
        denoise_fn = engine.make_denoise_fn({"network": params}, jc, ju)
        init = inputs["x_init"].transpose(0, 2, 3, 4, 1)
        tr6 = lambda a: a.transpose(0, 1, 3, 4, 5, 2)
        out = engine.sampler.sampling_blending(
            denoise_fn, jnp.asarray(init), jax.random.PRNGKey(0),
            jnp.asarray(x0_clean.transpose(0, 2, 3, 4, 1)),
            num_steps=N_STEPS,
            noise_override={
                "loop": tr6(inputs["loop_noise"][:N_STEPS]),
                "pre": tr6(pre_noise),
            },
        )
        ours = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    EDM = {
        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
        "params": {"sigma_min": 0.1, "sigma_max": 10.0, "rho": 7.0},
    }

    def _edm_ours(self):
        from ccedit_tpu.diffusion.discretization import EDMDiscretization

        return EDMDiscretization(sigma_min=0.1, sigma_max=10.0, rho=7.0)

    def test_heun_edm_chain(self, tv2v_pair, inputs):
        """Heun's 2nd-order correction (skipped at sigma_next==0) on the EDM
        rho-schedule — also pins DiscreteDenoiser's sigma->idx quantization
        of NON-legacy sigmas.  Deterministic: s_churn=0 (the CLI default)."""
        from ccedit_tpu.diffusion.samplers import HeunEDMSampler

        torch_denoiser, net, params = tv2v_pair
        ref = _run_torch_chain(
            torch_denoiser, "HeunEDMSampler", inputs, N_STEPS,
            extra_kwargs=dict(discretization_config=self.EDM),
            inject_loop_noise=False,
        )
        ours = _run_jax_chain(
            net, params,
            HeunEDMSampler(discretization=self._edm_ours(), num_steps=N_STEPS),
            inputs, N_STEPS, inject_loop_noise=False,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_euler_edm_chain(self, tv2v_pair, inputs):
        from ccedit_tpu.diffusion.samplers import EulerEDMSampler

        torch_denoiser, net, params = tv2v_pair
        ref = _run_torch_chain(
            torch_denoiser, "EulerEDMSampler", inputs, N_STEPS,
            extra_kwargs=dict(discretization_config=self.EDM),
            inject_loop_noise=False,
        )
        ours = _run_jax_chain(
            net, params,
            EulerEDMSampler(discretization=self._edm_ours(), num_steps=N_STEPS),
            inputs, N_STEPS, inject_loop_noise=False,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    S_CHURN, S_NOISE = 4.0, 1.1  # gamma = min(4/8, sqrt2-1) > 0 at EVERY step

    def _run_torch_edm_churn(self, torch_denoiser, inputs, sampler_cls_name,
                             pre_noise=None, inpaint=None):
        """Run a reference EDM sampler at s_churn>0 with torch.randn_like
        patched to a queue.  Per step the reference draws the inpaint/blend
        img_orig noise first (sampling.py:138-165), then the churn eps inside
        sampler_step (sampling.py:101-104); Heun's correction draws nothing."""
        import sgm.modules.diffusionmodules.sampling as ref_sampling

        cls = getattr(ref_sampling, sampler_cls_name)
        sampler = cls(
            discretization_config=self.EDM, num_steps=N_STEPS,
            guider_config=GUIDER_TV2V, s_churn=self.S_CHURN,
            s_noise=self.S_NOISE, verbose=False, device="cpu",
        )
        queue = []
        for i in range(N_STEPS):
            if pre_noise is not None:
                queue.append(torch.from_numpy(pre_noise[i]))
            queue.append(torch.from_numpy(inputs["loop_noise"][i]))
        cond, uc = self._torch_cond(inputs)
        orig_randn_like = torch.randn_like
        try:
            torch.randn_like = lambda x: queue.pop(0)
            with torch.no_grad():
                x = torch.from_numpy(inputs["x_init"]).clone()
                if inpaint is not None:
                    x0, mask = inpaint
                    ref = sampler.sample_inpainting(
                        torch_denoiser, x, cond, torch.from_numpy(x0),
                        torch.from_numpy(mask), uc=uc)
                else:
                    ref = sampler(torch_denoiser, x, cond, uc)
        finally:
            torch.randn_like = orig_randn_like
        assert not queue, f"{len(queue)} injected noise rows unconsumed"
        return _to_np(ref)

    def test_euler_edm_churn_chain(self, tv2v_pair, inputs):
        """The stochastic churn branch (sampling.py:88-134): eps = randn *
        s_noise scaled by sqrt(sigma_hat^2 - sigma^2) added BEFORE the Euler
        step at sigma_hat = sigma*(gamma+1) — the one sampler branch the
        deterministic (s_churn=0) chains above cannot reach."""
        from ccedit_tpu.diffusion.samplers import EulerEDMSampler

        torch_denoiser, net, params = tv2v_pair
        ref = self._run_torch_edm_churn(torch_denoiser, inputs, "EulerEDMSampler")
        ours = _run_jax_chain(
            net, params,
            EulerEDMSampler(discretization=self._edm_ours(), num_steps=N_STEPS,
                            s_churn=self.S_CHURN, s_noise=self.S_NOISE),
            inputs, N_STEPS,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_heun_edm_churn_chain(self, tv2v_pair, inputs):
        """Churn + Heun's correction: the correction half-step re-uses the
        churned sigma_hat state and draws NO further noise — one draw per
        step despite two network evals."""
        from ccedit_tpu.diffusion.samplers import HeunEDMSampler

        torch_denoiser, net, params = tv2v_pair
        ref = self._run_torch_edm_churn(torch_denoiser, inputs, "HeunEDMSampler")
        ours = _run_jax_chain(
            net, params,
            HeunEDMSampler(discretization=self._edm_ours(), num_steps=N_STEPS,
                           s_churn=self.S_CHURN, s_noise=self.S_NOISE),
            inputs, N_STEPS,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    @pytest.mark.parametrize("sampler_name", ["EulerEDMSampler", "HeunEDMSampler"])
    def test_edm_inpainting_churn_chain(self, tv2v_pair, inputs, sampler_name):
        """EDM sample_inpainting at s_churn>0 (sampling.py:138-165): per step
        the img_orig blend draw comes first, the churn eps second — both
        streams injected via the dict noise_override form."""
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.diffusion import samplers as our_samplers

        torch_denoiser, net, params = tv2v_pair
        rng = np.random.default_rng(999)
        x0_clean = rng.standard_normal(inputs["x_init"].shape).astype(np.float32)
        pre_noise = rng.standard_normal(
            (N_STEPS,) + inputs["x_init"].shape).astype(np.float32)
        mask_bcthw = np.ones((1, 1, 1, 8, 8), dtype=np.float32)
        mask_bcthw[..., :4] = 0.0

        ref = self._run_torch_edm_churn(
            torch_denoiser, inputs, sampler_name,
            pre_noise=pre_noise, inpaint=(x0_clean, mask_bcthw))

        cls = getattr(our_samplers, sampler_name)
        engine = _make_engine(
            net,
            cls(discretization=self._edm_ours(), num_steps=N_STEPS,
                s_churn=self.S_CHURN, s_noise=self.S_NOISE),
        )
        jc, ju = self._jax_cond(inputs)
        init = inputs["x_init"].transpose(0, 2, 3, 4, 1)
        tr6 = lambda a: a.transpose(0, 1, 3, 4, 5, 2)
        out = engine.sample(
            {"network": params}, jc, ju, shape=init.shape,
            rng=jax.random.PRNGKey(0), num_steps=N_STEPS,
            init_noise=init,
            inpaint_x0=jnp.asarray(x0_clean.transpose(0, 2, 3, 4, 1)),
            inpaint_mask=jnp.asarray(mask_bcthw.transpose(0, 2, 3, 4, 1)),
            loop_noise={
                "loop": tr6(inputs["loop_noise"][:N_STEPS]),
                "pre": tr6(pre_noise),
            },
        )
        ours = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_lms_chain(self, tv2v_pair, inputs):
        """Linear multistep (order 4): the reference integrates the Lagrange
        basis numerically (scipy quad); ours integrates it exactly — values
        must agree to quad tolerance, through the full chain."""
        from ccedit_tpu.diffusion.discretization import LegacyDDPMDiscretization
        from ccedit_tpu.diffusion.samplers import LinearMultistepSampler

        torch_denoiser, net, params = tv2v_pair
        ref = _run_torch_chain(
            torch_denoiser, "LinearMultistepSampler", inputs, N_STEPS,
            extra_kwargs=dict(order=4), inject_loop_noise=False,
        )
        ours = _run_jax_chain(
            net, params,
            LinearMultistepSampler(
                discretization=LegacyDDPMDiscretization(), num_steps=N_STEPS,
                order=4,
            ),
            inputs, N_STEPS, inject_loop_noise=False,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


class TestTrainingLossParity:
    """The TRAINING seam, pinned the same way: the reference's own
    ``StandardDiffusionLoss`` (loss.py:41-84 — sigma draw -> randn noise ->
    offset noise over input.shape[:varying_dim] -> DiscreteDenoiser ->
    eps-weighted reduction) is executed with an injected sigma/noise/offset
    stream, and our loss must produce the same per-sample values from the
    same injected tensors — including the channels-first->channels-last
    remap of ``offset_noise_varying_dim=3`` ((B,C,T)-varying offset noise,
    the shipped training YAMLs' setting).  The gradient test then pins the
    BACKWARD seam: torch autograd grads, pushed through the same weight
    converter, must equal jax.grad of our loss."""

    @pytest.fixture(scope="class")
    def loss_inputs(self, inputs):
        rng = np.random.default_rng(777)
        x = np.concatenate(
            [inputs["x_init"], 0.5 * inputs["x_init"]], axis=0
        )  # (2, 4, 3, 8, 8) — B=2 so per-sample sigma/weighting is exercised
        b, c, t = x.shape[:3]
        return dict(
            x=x,
            noise=rng.standard_normal(x.shape).astype(np.float32),
            offset=rng.standard_normal((b, c, t)).astype(np.float32),
            sigma_idx=np.array([137, 842], dtype=np.int64),
            ctx=np.concatenate([inputs["ctx_c"], inputs["ctx_u"]], axis=0),
            hint=np.concatenate([inputs["hint"], -inputs["hint"]], axis=0),
        )

    def _ref_loss(self, sgm, wrapper, dd, li, loss_type, offset_level):
        from unittest import mock

        from sgm.modules.diffusionmodules.loss import (
            StandardDiffusionLoss as RefLoss,
        )

        ref_loss = RefLoss(
            sigma_sampler_config={
                "target": "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling",
                "params": {"discretization_config": LEGACY, "num_idx": 1000},
            },
            type=loss_type,
            offset_noise_level=offset_level,
            offset_noise_varying_dim=3,
        )
        sigmas_t = ref_loss.sigma_sampler.idx_to_sigma(
            torch.from_numpy(li["sigma_idx"])
        ).float()
        ref_loss.sigma_sampler = lambda n: sigmas_t
        cond_t = {
            "crossattn": torch.from_numpy(li["ctx"]),
            "control_hint": torch.from_numpy(li["hint"]),
        }
        noise_t = torch.from_numpy(li["noise"])
        offset_t = torch.from_numpy(li["offset"])
        x_t = torch.from_numpy(li["x"])
        with mock.patch.object(torch, "randn_like", lambda *a, **k: noise_t), \
             mock.patch.object(torch, "randn", lambda *a, **k: offset_t):
            per_sample = ref_loss(wrapper, dd, lambda batch: cond_t, x_t, {})
        return sigmas_t.detach().numpy(), per_sample

    def _our_loss_args(self, net, params, li, loss_type, offset_level, sigmas_np):
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.diffusion.denoiser import DiscreteDenoiser
        from ccedit_tpu.diffusion.loss import StandardDiffusionLoss
        from ccedit_tpu.diffusion.sigma_sampling import make_sigma_sampler

        loss = StandardDiffusionLoss(
            sigma_sampler=make_sigma_sampler("discrete"),
            loss_type=loss_type,
            offset_noise_level=offset_level,
            offset_noise_varying_dim=3,
        )
        jdd = DiscreteDenoiser("eps", weighting="eps")
        cond = {
            "crossattn": jnp.asarray(li["ctx"]),
            "control_hint": jnp.asarray(li["hint"].transpose(0, 2, 3, 4, 1)),
        }
        x_j = jnp.asarray(li["x"].transpose(0, 2, 3, 4, 1))  # BCTHW -> BTHWC
        kw = dict(
            noise_override=li["noise"].transpose(0, 2, 3, 4, 1),
            sigma_override=sigmas_np,
            # (B, C, T) -> our broadcast shape (B, T, 1, 1, C)
            offset_override=li["offset"].transpose(0, 2, 1)[:, :, None, None, :],
        )

        def run(p):
            def net_fn(x, c_noise, c):
                return net.apply({"params": p}, x, c_noise, c)

            return loss(jax.random.PRNGKey(0), net_fn, jdd, cond, x_j, **kw)

        return run

    @pytest.mark.parametrize(
        "loss_type,offset_level",
        [("l2", 0.1), ("l1", 0.0)],
        ids=["l2-offset0.1-vd3", "l1-no-offset"],
    )
    def test_loss_value_parity(self, sgm, tv2v_pair, loss_inputs,
                               loss_type, offset_level):
        torch_denoiser, net, params = tv2v_pair
        sigmas_np, ref = self._ref_loss(
            sgm, torch_denoiser.wrapper, torch_denoiser.dd, loss_inputs,
            loss_type, offset_level,
        )
        run = self._our_loss_args(
            net, params, loss_inputs, loss_type, offset_level, sigmas_np)
        ours = np.asarray(run(params))
        np.testing.assert_allclose(
            ours, ref.detach().numpy(), rtol=1e-3, atol=1e-6)

    @pytest.mark.slow
    def test_training_gradient_parity(self, sgm, tv2v_pair, loss_inputs):
        """Backward seam: d(mean loss)/d(params) from torch autograd equals
        jax.grad of our loss — the torch grad dict is pushed through the SAME
        converter as the weights (every converter op is linear, so gradients
        convert by the identical mapping)."""
        import jax

        torch_denoiser, net, params = tv2v_pair
        tm = torch_denoiser.wrapper.diffusion_model
        tm.zero_grad(set_to_none=True)

        sigmas_np, per_sample = self._ref_loss(
            sgm, torch_denoiser.wrapper, torch_denoiser.dd, loss_inputs,
            "l2", 0.1,
        )
        per_sample.mean().backward()
        grad_sd = {}
        for k, v in tm.named_parameters():
            grad_sd[k] = (
                np.zeros(v.shape, dtype=np.float32)
                if v.grad is None else _to_np(v.grad)
            )
        unet_gsd = {k: v for k, v in grad_sd.items()
                    if not k.startswith("controlnet")}
        ref_grads = {
            "unet": convert_unet(unet_gsd, prefix="", video=True, **CONV_KW),
            "controlnet": convert_controlnet(
                grad_sd, prefix="controlnet.", **CONV_KW),
        }

        run = self._our_loss_args(net, params, loss_inputs, "l2", 0.1, sigmas_np)
        our_grads = jax.grad(lambda p: jax.numpy.mean(run(p)))(params)

        import flax

        ref_flat = flax.traverse_util.flatten_dict(ref_grads)
        our_flat = flax.traverse_util.flatten_dict(our_grads)
        assert set(ref_flat) == set(our_flat)
        for key in sorted(our_flat):
            np.testing.assert_allclose(
                np.asarray(our_flat[key]), np.asarray(ref_flat[key]),
                rtol=2e-3, atol=1e-5,
                err_msg="/".join(key),
            )
