"""EDM-style denoiser preconditioning.

Parity target: sgm/modules/diffusionmodules/denoiser.py:22-75.

``denoised = network(x * c_in, c_noise, cond) * c_out + x * c_skip``

The ``DiscreteDenoiser`` quantizes sigma to the nearest entry of a 1000-step
DDPM sigma table and passes the *index* as c_noise (the SD-1.5 timestep).
Pure functions over jnp; the network is any callable ``(x, c_noise, cond) -> x``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..utils.misc import append_dims
from .discretization import Discretization, LegacyDDPMDiscretization
from .scaling import make_scaling
from .weighting import make_weighting


class Denoiser:
    def __init__(self, scaling, weighting=None):
        if isinstance(scaling, str):
            scaling = make_scaling(scaling)
        if isinstance(weighting, str):
            weighting = make_weighting(weighting)
        self.scaling = scaling
        self.weighting = weighting

    def possibly_quantize_sigma(self, sigma):
        return sigma

    def possibly_quantize_c_noise(self, c_noise):
        return c_noise

    def w(self, sigma):
        return self.weighting(sigma)

    def __call__(self, network: Callable, x: jnp.ndarray, sigma: jnp.ndarray, cond) -> jnp.ndarray:
        """sigma: shape (B,). x: (B, ...). Matches denoiser.py:22-40."""
        sigma = self.possibly_quantize_sigma(sigma)
        sigma_b = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_b)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma.shape))
        return network(x * c_in, c_noise, cond) * c_out + x * c_skip


class DiscreteDenoiser(Denoiser):
    def __init__(
        self,
        scaling,
        weighting=None,
        num_idx: int = 1000,
        discretization: Discretization | None = None,
        do_append_zero: bool = False,
        quantize_c_noise: bool = True,
        flip: bool = True,
    ):
        super().__init__(scaling, weighting)
        if discretization is None:
            discretization = LegacyDDPMDiscretization()
        # flip=True -> ascending sigma table indexed by DDPM timestep
        self.sigmas = jnp.asarray(
            np.asarray(discretization(num_idx, do_append_zero=do_append_zero, flip=flip)),
            dtype=jnp.float32,
        )
        self.quantize_c_noise = quantize_c_noise

    def sigma_to_idx(self, sigma):
        dists = sigma - self.sigmas[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx):
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma):
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise):
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise)
        return c_noise


def make_denoiser(name: str = "discrete", **kwargs) -> Denoiser:
    if name == "discrete":
        return DiscreteDenoiser(**kwargs)
    if name == "base":
        return Denoiser(**kwargs)
    raise KeyError(name)
