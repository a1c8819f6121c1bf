"""Training-time sigma samplers.

Parity target: sgm/modules/diffusionmodules/sigma_sampling.py:6-31.
Functional: take a jax PRNG key, return per-sample sigmas; trace-safe so the
whole train step stays one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .discretization import Discretization, LegacyDDPMDiscretization


class EDMSampling:
    """Lognormal sigma sampling (EDM)."""

    def __init__(self, p_mean: float = -1.2, p_std: float = 1.2):
        self.p_mean = p_mean
        self.p_std = p_std

    def __call__(self, rng: jax.Array, n_samples: int) -> jnp.ndarray:
        log_sigma = self.p_mean + self.p_std * jax.random.normal(rng, (n_samples,))
        return jnp.exp(log_sigma)


class DiscreteSampling:
    """Uniform index over a discretization's sigma table (the CCEdit default:
    1000-entry LegacyDDPM table, sigma_sampling.py:17-31)."""

    def __init__(
        self,
        discretization: Discretization | None = None,
        num_idx: int = 1000,
        do_append_zero: bool = False,
        flip: bool = True,
    ):
        if discretization is None:
            discretization = LegacyDDPMDiscretization()
        self.num_idx = num_idx
        # flip=True -> ascending sigmas, indexed by DDPM timestep
        self.sigmas = jnp.asarray(
            np.asarray(discretization(num_idx, do_append_zero=do_append_zero, flip=flip)),
            dtype=jnp.float32,
        )

    def idx_to_sigma(self, idx):
        return self.sigmas[idx]

    def __call__(self, rng: jax.Array, n_samples: int) -> jnp.ndarray:
        idx = jax.random.randint(rng, (n_samples,), 0, self.num_idx)
        return self.idx_to_sigma(idx)


_SIGMA_SAMPLERS = {"edm": EDMSampling, "discrete": DiscreteSampling}


def make_sigma_sampler(name: str, **kwargs):
    return _SIGMA_SAMPLERS[name](**kwargs)
