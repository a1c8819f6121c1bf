"""EDM-style denoiser preconditioning scalings.

Parity target: sgm/modules/diffusionmodules/denoiser_scaling.py:4-31.
Each scaling maps sigma -> (c_skip, c_out, c_in, c_noise) with
``denoised = net(x * c_in, c_noise, cond) * c_out + x * c_skip``.

Pure jnp functions of a broadcast-ready sigma tensor; trace-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


class EpsScaling:
    """eps-prediction (SD-1.5): c_skip=1, c_out=-sigma, c_in=1/sqrt(sigma^2+1),
    c_noise=sigma.  The scaling CCEdit's configs use."""

    def __call__(self, sigma):
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


class EDMScaling:
    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = sigma_data

    def __call__(self, sigma):
        s2 = self.sigma_data**2
        c_skip = s2 / (sigma**2 + s2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + s2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + s2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


class VScaling:
    """v-prediction: c_skip=1/(sigma^2+1), c_out=-sigma/sqrt(sigma^2+1)."""

    def __call__(self, sigma):
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


_SCALINGS = {"eps": EpsScaling, "edm": EDMScaling, "v": VScaling}


def make_scaling(name: str, **kwargs):
    return _SCALINGS[name](**kwargs)
