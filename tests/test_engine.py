"""End-to-end engine tests at tiny scale: init, sampling, training step,
freeze policies, EMA — the integration the reference only exercised manually
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ccedit_tpu.conditioning.conditioner import Conditioner, EmbedderSpec
from ccedit_tpu.conditioning.embedders import IdentityEncoder, VAEEmbedder
from ccedit_tpu.diffusion import (
    DiscreteDenoiser,
    LegacyDDPMDiscretization,
    StandardDiffusionLoss,
    VanillaCFG,
    make_sampler,
    make_sigma_sampler,
)
from ccedit_tpu.models.engine import CCEditEngine
from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.unet import UNetModel
from ccedit_tpu.modules.vae import AutoencoderKL

TINY = dict(
    in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
    transformer_depth=1, context_dim=16,
)


class TokensEmbedder(IdentityEncoder):
    """Stand-in text embedder: passes through (B, L, D) arrays."""


def make_tiny_engine(with_vae=True, freeze="none"):
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **TINY)
    cn = ControlNet2D(hint_channels=3, **TINY)
    net = CCEditNetwork(unet=unet, controlnet=cn)
    conditioner = Conditioner([
        EmbedderSpec(embedder=TokensEmbedder(), input_key="txt_emb", out_key="crossattn", ucg_rate=0.1),
        EmbedderSpec(embedder=IdentityEncoder(), input_key="control_hint"),
    ])
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32) if with_vae else None
    return CCEditEngine(
        network=net,
        denoiser=DiscreteDenoiser(scaling="eps", weighting="eps"),
        sampler=make_sampler(
            "dpmpp_2s_ancestral", discretization=LegacyDDPMDiscretization(), num_steps=4
        ),
        conditioner=conditioner,
        vae=vae,
        loss_fn=StandardDiffusionLoss(sigma_sampler=make_sigma_sampler("discrete")),
        guider=VanillaCFG(scale=5.0),
        freeze_policy=freeze,
    )


def example_batch(b=1, t=2, hw=16):
    # tiny VAE is f=2 (16->8 latents); the ControlNet hint pyramid is f=8, so
    # hints are 8x the latent resolution = 64
    return {
        "jpg": np.zeros((b, t, hw, hw, 3), dtype=np.float32),
        "txt_emb": np.zeros((b, 7, 16), dtype=np.float32),
        "control_hint": np.zeros((b, t, 8 * hw // 2, 8 * hw // 2, 3), dtype=np.float32),
    }


@pytest.fixture(scope="module")
def engine_and_params():
    engine = make_tiny_engine()
    params = engine.init_params(jax.random.PRNGKey(0), example_batch())
    return engine, params


class TestEngine:
    def test_init_param_groups(self, engine_and_params):
        engine, params = engine_and_params
        assert set(params) == {"network", "vae", "conditioner"}
        assert "unet" in params["network"] and "controlnet" in params["network"]

    def test_first_stage_roundtrip_shapes(self, engine_and_params):
        engine, params = engine_and_params
        x = jnp.zeros((1, 2, 16, 16, 3))
        z = engine.encode_first_stage(params, x)
        assert z.shape == (1, 2, 8, 8, 4)
        rec = engine.decode_first_stage(params, z)
        assert rec.shape == x.shape

    def test_sample_end_to_end(self, engine_and_params):
        engine, params = engine_and_params
        batch = example_batch()
        c, uc = engine.conditioner.get_unconditional_conditioning(
            params["conditioner"], batch, batch
        )
        out = engine.sample(
            params, c, uc, (1, 2, 8, 8, 4), jax.random.PRNGKey(1)
        )
        assert out.shape == (1, 2, 8, 8, 4)
        assert bool(jnp.isfinite(out).all())

    def test_sample_jits(self, engine_and_params):
        engine, params = engine_and_params
        batch = example_batch()
        c, uc = engine.conditioner.get_unconditional_conditioning(
            params["conditioner"], batch, batch
        )

        @jax.jit
        def run(key):
            return engine.sample(params, c, uc, (1, 2, 8, 8, 4), key)

        a = run(jax.random.PRNGKey(2))
        b = run(jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_sdedit_start_math(self, engine_and_params):
        """sdedit must start the loop from z + noise*sigma0 on the pruned
        schedule (sampling_tv2v.py:429-446): engine.sample passes
        (z + noise*sigma0)/sqrt(1+sigma0^2) to the sampler, whose prepare
        rescale restores z + noise*sigma0 exactly."""
        from ccedit_tpu.diffusion.discretization import (
            Img2ImgDiscretizationWrapper, LegacyDDPMDiscretization,
        )
        from ccedit_tpu.diffusion.samplers import make_sampler

        engine, params = engine_and_params
        old_sampler = engine.sampler
        disc = Img2ImgDiscretizationWrapper(
            discretization=LegacyDDPMDiscretization(), strength=0.5
        )
        captured = {}

        class Recording:
            def get_sigmas(self, n=None):
                return disc(4, do_append_zero=True)

            def __call__(self, denoise_fn, x, rng, num_steps=None,
                         noise_override=None):
                captured["x"] = x
                return x

            def prepare_x(self, x, sigmas):
                return x

        engine.sampler = Recording()
        try:
            shape = (1, 2, 8, 8, 4)
            z = jnp.full(shape, 0.3)
            batch = example_batch()
            c, uc = engine.conditioner.get_unconditional_conditioning(
                params["conditioner"], batch, batch
            )
            rng = jax.random.PRNGKey(7)
            engine.sample(params, c, uc, shape, rng, num_steps=4,
                          x_prior=z, mode="sdedit")
            # reproduce the noise the engine drew
            k_init, _ = jax.random.split(rng)
            noise = jax.random.normal(k_init, shape)
            sigma0 = float(disc(4, do_append_zero=True)[0])
            expected = (z + noise * sigma0) / np.sqrt(1.0 + sigma0**2)
            np.testing.assert_allclose(
                np.asarray(captured["x"]), np.asarray(expected), rtol=1e-6
            )
            # pruned schedule: strength 0.5 of 5 sigmas -> 2 kept
            assert len(disc(4, do_append_zero=True)) == 2
        finally:
            engine.sampler = old_sampler

    def test_prior_mixing_matches_reference(self, engine_and_params):
        """x-prior init: randn = c_x*prior + c_noise*randn
        (sampling_tv2v.py:371-376) — c_noise defaults to 1, NOT 1-c_x."""
        engine, params = engine_and_params
        captured = {}
        old_sampler = engine.sampler

        class Recording:
            def get_sigmas(self, n=None):
                return old_sampler.get_sigmas(n)

            def __call__(self, denoise_fn, x, rng, num_steps=None,
                         noise_override=None):
                captured["x"] = x
                return x

        engine.sampler = Recording()
        try:
            shape = (1, 2, 8, 8, 4)
            prior = jnp.full(shape, 2.0)
            batch = example_batch()
            c, uc = engine.conditioner.get_unconditional_conditioning(
                params["conditioner"], batch, batch
            )
            rng = jax.random.PRNGKey(11)
            engine.sample(params, c, uc, shape, rng, num_steps=4,
                          x_prior=prior, prior_coefficient=0.03)
            k_init, _ = jax.random.split(rng)
            noise = jax.random.normal(k_init, shape)
            expected = 1.0 * noise + 0.03 * prior
            np.testing.assert_allclose(
                np.asarray(captured["x"]), np.asarray(expected), rtol=1e-6
            )
        finally:
            engine.sampler = old_sampler

    @pytest.mark.slow
    def test_train_step_runs_and_updates_only_trainable(self):
        engine = make_tiny_engine(freeze="spatial_tv2v")
        params = engine.init_params(jax.random.PRNGKey(0), example_batch())
        tx = engine.make_optimizer(1e-3, params)
        state = engine.create_train_state(params, tx)
        step = engine.make_train_step(tx)

        batch = engine.conditioner.prepare(example_batch())
        batch["jpg"] = np.random.RandomState(0).randn(1, 2, 16, 16, 3).astype(np.float32)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

        import flax

        before = flax.traverse_util.flatten_dict(params["network"])
        after = flax.traverse_util.flatten_dict(new_state.params["network"])
        from ccedit_tpu.train.freeze import freeze_mask

        mask = flax.traverse_util.flatten_dict(
            freeze_mask(params["network"], "spatial_tv2v")
        )
        changed = {k: not np.allclose(before[k], after[k]) for k in before}
        # frozen params must be bit-identical
        for k, trainable in mask.items():
            if not trainable:
                assert not changed[k], f"frozen param {k} changed"
        # at least some trainable params (temporal layers get gradients) move
        assert any(changed[k] for k, tr in mask.items() if tr)

    @pytest.mark.slow
    def test_vae_params_never_update(self):
        engine = make_tiny_engine(freeze="none")
        params = engine.init_params(jax.random.PRNGKey(0), example_batch())
        tx = engine.make_optimizer(1e-2, params)
        state = engine.create_train_state(params, tx)
        step = engine.make_train_step(tx)
        batch = engine.conditioner.prepare(example_batch())
        batch["jpg"] = np.random.RandomState(1).randn(1, 2, 16, 16, 3).astype(np.float32)
        new_state, _ = step(state, batch, jax.random.PRNGKey(4))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state.params["vae"], new_state.params["vae"],
        )


class TestFreezeMask:
    def test_spatial_policy_counts(self):
        from ccedit_tpu.train.freeze import count_trainable, freeze_mask

        engine = make_tiny_engine()
        params = engine.init_params(jax.random.PRNGKey(0), example_batch())
        m_spatial = freeze_mask(params["network"], "spatial")
        m_tv2v = freeze_mask(params["network"], "spatial_tv2v")
        c_spatial = count_trainable(params["network"], m_spatial)
        c_tv2v = count_trainable(params["network"], m_tv2v)
        # spatial trains controlnet too; tv2v freezes it -> fewer trainables
        assert 0 < c_tv2v["trainable"] < c_spatial["trainable"] < c_spatial["total"]

    def test_openlora_policies_train_lora_params(self):
        from ccedit_tpu.train.freeze import freeze_mask

        params = {
            "unet": {
                "block_spatial": {"kernel": np.zeros(1)},
                "block_temporal": {"kernel": np.zeros(1)},
                "attn_lora_down": {"kernel": np.zeros(1)},
            },
            "controlnet": {"conv": {"kernel": np.zeros(1)}},
            "controlnet_img": {"conv": {"kernel": np.zeros(1)}},
        }
        m = freeze_mask(params, "spatial_openlora")
        assert m["unet"]["attn_lora_down"]["kernel"]
        assert m["unet"]["block_temporal"]["kernel"]
        assert not m["unet"]["block_spatial"]["kernel"]
        assert m["controlnet"]["conv"]["kernel"]  # spatial trains controlnets

        m = freeze_mask(params, "spatial_tv2v_openlora")
        assert m["unet"]["attn_lora_down"]["kernel"]
        assert not m["controlnet"]["conv"]["kernel"]  # structure branch frozen
        assert m["controlnet_img"]["conv"]["kernel"]  # appearance branch open


class TestEma:
    def test_trainable_only_shadow_matches_full_ema(self, engine_and_params):
        """EMA shadows only the trainable subtree (frozen params are
        constant, so their EMA is themselves); merge_ema must reconstitute
        exactly what a full-tree EMA would produce."""
        import flax.traverse_util as trav

        from ccedit_tpu.train.ema import EmaState
        from ccedit_tpu.train.freeze import freeze_mask

        engine, params = engine_and_params
        engine.freeze_policy = "spatial"
        engine.use_ema = True
        net0 = params["network"]
        sub = engine.ema_subset(net0)
        n_sub = sum(v.size for v in jax.tree_util.tree_leaves(sub))
        n_all = sum(v.size for v in jax.tree_util.tree_leaves(net0))
        assert 0 < n_sub < n_all  # the policy actually freezes something

        # simulate one step that perturbs ONLY trainable leaves (what a
        # masked optimizer does), then compare against a full-tree oracle
        mask = trav.flatten_dict(freeze_mask(net0, "spatial"))
        net1 = trav.unflatten_dict({
            k: v + 1.0 if mask[k] else v
            for k, v in trav.flatten_dict(net0).items()
        })

        ema_sub = EmaState.create(engine.ema_subset(net0))
        ema_sub = ema_sub.update(engine.ema_subset(net1))
        merged = engine.merge_ema(net1, ema_sub.shadow)

        ema_full = EmaState.create(net0).update(net1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6),
            merged, ema_full.shadow)
        engine.use_ema = False

    def test_ema_warmup_decay(self):
        from ccedit_tpu.train.ema import EmaState

        p0 = {"w": jnp.zeros((3,))}
        ema = EmaState.create(p0, decay=0.9999)
        p1 = {"w": jnp.ones((3,))}
        ema = ema.update(p1)
        # first update: decay = min(0.9999, 2/11);
        # shadow = 0 - (1-decay)*(0-1) = 1 - 2/11 = 9/11
        np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 9.0 / 11.0, rtol=1e-6)

    def test_shadow_never_aliases_params(self):
        """EmaState.create must COPY the seed params: an aliased leaf makes
        jit donation of the TrainState donate the same buffer twice
        (INVALID_ARGUMENT 'Attempt to donate the same buffer twice' on the
        single-device path, where no device_put re-materializes the tree)."""
        from ccedit_tpu.train.ema import EmaState

        p0 = {"w": jnp.arange(3.0), "b": {"x": jnp.ones((2, 2))}}
        ema = EmaState.create(p0)
        for pl, sl in zip(jax.tree_util.tree_leaves(p0),
                          jax.tree_util.tree_leaves(ema.shadow)):
            assert pl.unsafe_buffer_pointer() != sl.unsafe_buffer_pointer()
