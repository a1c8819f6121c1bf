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


class TestEma:
    def test_ema_warmup_decay(self):
        from ccedit_tpu.train.ema import EmaState

        p0 = {"w": jnp.zeros((3,))}
        ema = EmaState.create(p0, decay=0.9999)
        p1 = {"w": jnp.ones((3,))}
        ema = ema.update(p1)
        # first update: decay = min(0.9999, 2/11);
        # shadow = 0 - (1-decay)*(0-1) = 1 - 2/11 = 9/11
        np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 9.0 / 11.0, rtol=1e-6)
