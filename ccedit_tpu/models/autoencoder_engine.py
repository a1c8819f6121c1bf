"""VAE (autoencoder) TRAINING: the 2-optimizer GAN engine.

Behavioural parity targets:
  * AutoencodingEngine (sgm/models/autoencoder.py:117-280): encoder+decoder+
    regularizer, alternating generator/discriminator optimization.
  * GeneralLPIPSWithDiscriminator (sgm/modules/autoencoding/losses/
    __init__.py:87-246): L1 + LPIPS reconstruction, logvar-weighted NLL,
    adaptive generator/GAN weight from last-layer gradient norms, hinge or
    vanilla discriminator loss, disc warm-up threshold.
  * LatentLPIPS (:19-84): latent L2 + perceptual loss through a frozen
    decoder.

TPU-first design: Lightning's ``optimizer_idx`` ping-pong becomes ONE jitted
step that updates generator then discriminator functionally (two optax
states).  The adaptive d_weight — torch takes ``autograd.grad`` of nll and
g_loss w.r.t. the decoder's last conv — is computed with two ``jax.grad``
calls over a decode re-run parameterized only by that last-layer kernel, so
the jitted program stays a pure function of (params, batch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..modules.discriminator import (
    NLayerDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
)
from ..modules.lpips import LPIPS
from ..modules.vae import AutoencoderKL


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """losses/__init__.py:13-16 — jit-safe."""
    return jnp.where(global_step < threshold, value, weight)


@dataclasses.dataclass
class LPIPSWithDiscriminatorConfig:
    disc_start: int = 0
    logvar_init: float = 0.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"  # or "vanilla"
    learn_logvar: bool = False
    regularization_weights: Optional[Dict[str, float]] = None


class AutoencodingEngine:
    """KL autoencoder + GAN/LPIPS training losses.

    Params layout: {"ae": <AutoencoderKL params>, "logvar": scalar,
    "disc": <NLayerDiscriminator params>, "lpips": <frozen LPIPS params>}.
    """

    def __init__(self, ae: Optional[AutoencoderKL] = None,
                 loss_cfg: Optional[LPIPSWithDiscriminatorConfig] = None):
        self.ae = ae or AutoencoderKL()
        self.cfg = loss_cfg or LPIPSWithDiscriminatorConfig()
        self.disc = NLayerDiscriminator(input_nc=self.cfg.disc_in_channels,
                                        n_layers=self.cfg.disc_num_layers)
        self.lpips = LPIPS()
        self.d_loss = (hinge_d_loss if self.cfg.disc_loss == "hinge"
                       else vanilla_d_loss)

    # -- init ---------------------------------------------------------------

    def init_params(self, rng, sample) -> Dict:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        ae_p = self.ae.init(r1, sample, jax.random.PRNGKey(0))["params"]
        from ..modules.discriminator import discriminator_init

        return {
            "ae": ae_p,
            "logvar": jnp.asarray(self.cfg.logvar_init, jnp.float32),
            "disc": discriminator_init(r2, self.disc, sample),
            "lpips": self.lpips.init(r3, sample, sample)["params"],
        }

    # -- forward ------------------------------------------------------------

    def encode(self, ae_params, x, rng, noise_override=None):
        """``noise_override`` replaces the posterior's N(0,1) draw (SURVEY
        §7.1 injection pattern) so the torch oracle's eps stream can be
        replayed in parity tests."""
        from ..modules.vae import DiagonalGaussian

        moments = self.ae.apply({"params": ae_params}, x,
                                method=AutoencoderKL.encode_moments)
        posterior = DiagonalGaussian(moments)
        if noise_override is not None:
            z = posterior.mean + posterior.std * jnp.asarray(
                noise_override, posterior.mean.dtype)
        else:
            z = posterior.sample(rng)
        return z, {"kl_loss": jnp.mean(posterior.kl())}

    def decode(self, ae_params, z):
        return self.ae.apply({"params": ae_params}, z,
                             method=AutoencoderKL.decode)

    # -- losses -------------------------------------------------------------

    def _nll(self, params, x, xrec):
        # NOTE: the reference stores pixelloss_weight but never applies it in
        # forward (losses/__init__.py:113 vs :176) — the field is kept for
        # YAML compat and left unapplied to match that behavior exactly.
        rec = jnp.abs(x - xrec)
        if self.cfg.perceptual_weight > 0:
            p = self.lpips.apply({"params": params["lpips"]}, x, xrec)
            rec = rec + self.cfg.perceptual_weight * p
        nll = rec / jnp.exp(params["logvar"]) + params["logvar"]
        return jnp.sum(nll) / x.shape[0], rec

    def _adaptive_weight(self, params, x, z, xrec_detached):
        """d_weight = |∇_last nll| / (|∇_last g_loss| + 1e-4), clipped; the
        gradient flows through a decode() re-run that closes over everything
        except the decoder's final conv kernel (= get_last_layer())."""
        ae = params["ae"]
        last = ae["decoder"]["conv_out"]["kernel"]

        def decode_with(w):
            p = {**ae, "decoder": {**ae["decoder"],
                                   "conv_out": {**ae["decoder"]["conv_out"],
                                                "kernel": w}}}
            return self.decode(p, z)

        def nll_of(w):
            return self._nll(params, x, decode_with(w))[0]

        def g_of(w):
            return -jnp.mean(self.disc.apply({"params": params["disc"]},
                                             decode_with(w)))

        nll_g = jax.grad(nll_of)(last)
        g_g = jax.grad(g_of)(last)
        d_w = jnp.linalg.norm(nll_g.ravel()) / (jnp.linalg.norm(g_g.ravel())
                                                + 1e-4)
        d_w = jnp.clip(d_w, 0.0, 1e4)
        return jax.lax.stop_gradient(d_w) * self.cfg.disc_weight

    def generator_loss(self, params, x, rng, global_step,
                       noise_override=None) -> Tuple[jnp.ndarray, Dict]:
        z, reg_log = self.encode(params["ae"], x, rng,
                                 noise_override=noise_override)
        xrec = self.decode(params["ae"], z)
        nll, rec = self._nll(params, x, xrec)
        g_loss = -jnp.mean(self.disc.apply({"params": params["disc"]}, xrec))
        if self.cfg.disc_factor > 0:
            d_weight = self._adaptive_weight(
                params, x, jax.lax.stop_gradient(z), xrec)
        else:
            d_weight = jnp.asarray(0.0)
        disc_factor = adopt_weight(self.cfg.disc_factor, global_step,
                                   self.cfg.disc_start)
        loss = nll + d_weight * disc_factor * g_loss
        log = {"nll_loss": nll, "rec_loss": jnp.mean(rec), "g_loss": g_loss,
               "d_weight": d_weight, "logvar": params["logvar"]}
        for k, v in reg_log.items():
            w = (self.cfg.regularization_weights or {}).get(k)
            if w is not None:
                loss = loss + w * v
            log[k] = v
        log["total_loss"] = loss
        return loss, log

    def discriminator_loss(self, params, x, rng, global_step,
                           noise_override=None):
        z, _ = self.encode(params["ae"], x, rng,
                           noise_override=noise_override)
        xrec = self.decode(params["ae"], z)
        logits_real = self.disc.apply({"params": params["disc"]}, x)
        logits_fake = self.disc.apply({"params": params["disc"]},
                                      jax.lax.stop_gradient(xrec))
        disc_factor = adopt_weight(self.cfg.disc_factor, global_step,
                                   self.cfg.disc_start)
        d_loss = disc_factor * self.d_loss(logits_real, logits_fake)
        return d_loss, {"disc_loss": d_loss,
                        "logits_real": jnp.mean(logits_real),
                        "logits_fake": jnp.mean(logits_fake)}


class LatentLPIPS:
    """losses/__init__.py:19-84: latent L2 + LPIPS through a frozen decoder."""

    def __init__(self, decoder: AutoencoderKL,
                 perceptual_weight: float = 1.0, latent_weight: float = 1.0,
                 perceptual_weight_on_inputs: float = 0.0):
        self.decoder = decoder
        self.lpips = LPIPS()
        self.perceptual_weight = perceptual_weight
        self.latent_weight = latent_weight
        self.perceptual_weight_on_inputs = perceptual_weight_on_inputs

    def __call__(self, params, latent_inputs, latent_predictions,
                 image_inputs=None):
        log = {}
        l2 = jnp.square(latent_inputs - latent_predictions)
        log["latent_l2_loss"] = jnp.mean(l2)
        loss = jnp.mean(l2)
        recons = None
        if self.perceptual_weight > 0:
            recons = self.decoder.apply({"params": params["decoder"]},
                                        latent_predictions,
                                        method=AutoencoderKL.decode)
            targets = self.decoder.apply({"params": params["decoder"]},
                                         latent_inputs,
                                         method=AutoencoderKL.decode)
            p = jnp.mean(self.lpips.apply({"params": params["lpips"]},
                                          targets, recons))
            loss = self.latent_weight * jnp.mean(l2) + self.perceptual_weight * p
            log["perceptual_loss"] = p
        if self.perceptual_weight_on_inputs > 0 and image_inputs is not None:
            if recons is None:
                recons = self.decoder.apply({"params": params["decoder"]},
                                            latent_predictions,
                                            method=AutoencoderKL.decode)
            p2 = jnp.mean(self.lpips.apply({"params": params["lpips"]},
                                           image_inputs, recons))
            loss = loss + self.perceptual_weight_on_inputs * p2
            log["perceptual_loss_on_inputs"] = p2
        return loss, log


class VAETrainer:
    """Two-optimizer alternating trainer (autoencoder.py:184-218, 252-266):
    one jitted step runs the generator update then the discriminator update."""

    def __init__(self, engine: AutoencodingEngine, lr: float = 4.5e-6,
                 lr_g_factor: float = 1.0):
        self.engine = engine
        self.opt_g = optax.adam(lr * lr_g_factor)
        self.opt_d = optax.adam(lr)
        self._step = jax.jit(self._train_step)

    def init_state(self, rng, sample):
        params = self.engine.init_params(rng, sample)
        g_mask = {"ae": True, "logvar": self.engine.cfg.learn_logvar,
                  "disc": False, "lpips": False}
        self.g_labels = g_mask
        return {
            "params": params,
            "opt_g": self.opt_g.init(self._g_subset(params)),
            "opt_d": self.opt_d.init(params["disc"]),
            "step": jnp.asarray(0, jnp.int32),
        }

    def _g_subset(self, params):
        out = {"ae": params["ae"]}
        if self.engine.cfg.learn_logvar:
            out["logvar"] = params["logvar"]
        return out

    def _train_step(self, state, batch, rng):
        params = state["params"]
        r1, r2 = jax.random.split(rng)

        def g_loss_fn(g_params):
            p = {**params, **g_params}
            return self.engine.generator_loss(p, batch, r1, state["step"])

        (g_loss, g_log), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(self._g_subset(params))
        g_updates, opt_g = self.opt_g.update(g_grads, state["opt_g"],
                                             self._g_subset(params))
        new_g = optax.apply_updates(self._g_subset(params), g_updates)
        params = {**params, **new_g}

        def d_loss_fn(disc_params):
            p = {**params, "disc": disc_params}
            return self.engine.discriminator_loss(p, batch, r2, state["step"])

        (d_loss, d_log), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params["disc"])
        d_updates, opt_d = self.opt_d.update(d_grads, state["opt_d"],
                                             params["disc"])
        params = {**params, "disc": optax.apply_updates(params["disc"],
                                                        d_updates)}
        logs = {**{f"train/{k}": v for k, v in g_log.items()},
                **{f"train/{k}": v for k, v in d_log.items()}}
        return {
            "params": params, "opt_g": opt_g, "opt_d": opt_d,
            "step": state["step"] + 1,
        }, logs

    def train_step(self, state, batch, rng):
        return self._step(state, batch, rng)
