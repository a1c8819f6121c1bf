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
        noise_override: Optional[jnp.ndarray] = None,
        sigma_override: Optional[jnp.ndarray] = None,
        offset_override: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: clean latents (B, ...). Returns per-sample losses (B,).

        The ``*_override`` tensors replace the jax.random draws (SURVEY §7.1
        parity harness): inject the reference's torch sigma/noise/offset
        stream to pin the training target bit-for-bit."""
        k_sigma, k_noise, k_offset = jax.random.split(rng, 3)
        sigmas = (jnp.asarray(sigma_override, dtype=jnp.float32)
                  if sigma_override is not None
                  else self.sigma_sampler(k_sigma, x.shape[0]))
        noise = (jnp.asarray(noise_override, dtype=x.dtype)
                 if noise_override is not None
                 else jax.random.normal(k_noise, x.shape, dtype=x.dtype))
        if self.offset_noise_level > 0.0:
            # ``offset_noise_varying_dim`` keeps the REFERENCE's channels-first
            # dim order (loss.py:49-57: offs = randn(input.shape[:d]) in
            # (B, C, *spatial) — the shipped training YAMLs use d=3, i.e. the
            # offset varies over (B, C, T) and is shared over (H, W)).  Our
            # layout is channels-last (B, *spatial, C), so we draw into the
            # equivalent broadcast shape instead of x.shape[:d].
            vshape = self._offset_shape(x.shape)
            offs = (jnp.asarray(offset_override, dtype=x.dtype)
                    if offset_override is not None
                    else jax.random.normal(k_offset, vshape, dtype=x.dtype))
            assert offs.shape == vshape, (offs.shape, vshape)
            noise = noise + self.offset_noise_level * offs
        noised = x + noise * append_dims(sigmas, x.ndim)
        model_output = denoiser(network, noised, sigmas, cond)
        w = append_dims(denoiser.w(sigmas), x.ndim)
        return self.get_loss(model_output, x, w)

    def _offset_shape(self, xshape):
        """Broadcast shape of the offset-noise draw in OUR channels-last
        layout for a reference-order ``offset_noise_varying_dim``.  Reference
        dim k maps to: 0 (B) -> 0, 1 (C) -> last, k>=2 (spatial) -> k-1."""
        d = self.offset_noise_varying_dim
        n = len(xshape)
        assert n > d, (xshape, d)
        ref_to_ours = [0, n - 1] + list(range(1, n - 1))
        shape = [1] * n
        for ref_dim in range(d):
            ax = ref_to_ours[ref_dim]
            shape[ax] = xshape[ax]
        return tuple(shape)

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
