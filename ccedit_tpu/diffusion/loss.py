"""Training loss.

Parity target: sgm/modules/diffusionmodules/loss.py:10-84 (StandardDiffusionLoss):
sample sigma per batch element, add noise (optionally 'offset noise' shared
over trailing dims beyond ``offset_noise_varying_dim``), denoise, and take a
weighted l2/l1 against the clean input.  LPIPS variant is provided via an
injected perceptual callable (kept out of the hot path by default).

Functional: ``loss(rng, network, denoiser, cond, x) -> per-sample loss`` so it
jits into the training step.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.misc import append_dims
from .denoiser import Denoiser


class StandardDiffusionLoss:
    def __init__(
        self,
        sigma_sampler,
        loss_type: str = "l2",
        offset_noise_level: float = 0.0,
        offset_noise_varying_dim: int = 1,
        perceptual_fn: Optional[Callable] = None,
    ):
        if loss_type not in ("l2", "l1", "lpips"):
            raise ValueError(loss_type)
        if loss_type == "lpips" and perceptual_fn is None:
            raise ValueError("lpips loss requires a perceptual_fn")
        self.sigma_sampler = sigma_sampler
        self.loss_type = loss_type
        self.offset_noise_level = offset_noise_level
        self.offset_noise_varying_dim = offset_noise_varying_dim
        self.perceptual_fn = perceptual_fn

    def __call__(
        self,
        rng: jax.Array,
        network: Callable,
        denoiser: Denoiser,
        cond,
        x: jnp.ndarray,
    ) -> jnp.ndarray:
        """x: clean latents (B, ...). Returns per-sample losses (B,)."""
        k_sigma, k_noise, k_offset = jax.random.split(rng, 3)
        sigmas = self.sigma_sampler(k_sigma, x.shape[0])
        noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        if self.offset_noise_level > 0.0:
            # offset noise broadcast over dims >= offset_noise_varying_dim
            # (loss.py:49-57; varying_dim=3 in BCTHW == (B, T, C) vary in our
            # BTHWC layout — handled by the caller choosing varying_dim)
            vshape = x.shape[: self.offset_noise_varying_dim]
            offs = jax.random.normal(k_offset, vshape, dtype=x.dtype)
            noise = noise + self.offset_noise_level * append_dims(offs, x.ndim)
        noised = x + noise * append_dims(sigmas, x.ndim)
        model_output = denoiser(network, noised, sigmas, cond)
        w = append_dims(denoiser.w(sigmas), x.ndim)
        return self.get_loss(model_output, x, w)

    @staticmethod
    def make_lpips_fn(lpips_params):
        """Build a perceptual_fn from converted LPIPS params
        (modules.lpips.convert_lpips): folds leading dims into batch, runs
        the VGG16 LPIPS net on channels-last 3ch frames, averages per sample.
        Mirrors the reference's ``self.lpips(model_output, target)``
        (sgm loss.py:51-53, 82-84) with an actual in-repo net."""
        from ..modules.lpips import LPIPS

        net = LPIPS()

        def fn(a, b):
            bsz = a.shape[0]
            a2 = a.reshape((-1,) + a.shape[-3:])
            b2 = b.reshape((-1,) + b.shape[-3:])
            d = net.apply({"params": lpips_params}, a2, b2)
            return jnp.mean(d.reshape(bsz, -1), axis=1)

        return fn

    def get_loss(self, model_output, target, w):
        b = target.shape[0]
        if self.loss_type == "l2":
            return jnp.mean((w * (model_output - target) ** 2).reshape(b, -1), axis=1)
        if self.loss_type == "l1":
            return jnp.mean((w * jnp.abs(model_output - target)).reshape(b, -1), axis=1)
        return self.perceptual_fn(model_output, target).reshape(-1)
