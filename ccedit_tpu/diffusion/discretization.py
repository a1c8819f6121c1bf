"""Sigma discretizations (noise-level schedules).

Behavioural parity targets (reference, studied not copied):
  * EDMDiscretization        — sgm/modules/diffusionmodules/discretizer.py:28-39
  * LegacyDDPMDiscretization — discretizer.py:42-69 (the schedule CCEdit ships)
  * Img2ImgDiscretizationWrapper (strength-based sigma pruning)
                             — scripts/demo/streamlit_helpers.py:212-233

TPU-first design: schedules are *host-side numpy in float64*.  They are tiny
(<=1000 entries), computed once per sampling run, and handed to the jitted
sampler scan as constant arrays — nothing here ever traces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    """Sub-sample ``num_substeps`` indices out of ``max_step`` DDPM timesteps.

    Matches discretizer.py:11-14: linspace from max_step-1 down to 0 (exclusive),
    truncated to int, reversed to ascending order.
    """
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


def make_ddpm_alphas_cumprod(
    num_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
) -> np.ndarray:
    """The LDM/SD 'linear' beta schedule: betas linear in sqrt-space.

    make_beta_schedule('linear', ...) — sgm/modules/diffusionmodules/util.py:24-37.
    """
    betas = (
        np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64)
        ** 2
    )
    alphas = 1.0 - betas
    return np.cumprod(alphas, axis=0)


class Discretization:
    """Base class: ``__call__(n)`` returns descending sigmas, optionally with a
    trailing zero appended (the sampler convention)."""

    def get_sigmas(self, n: int) -> np.ndarray:  # descending
        raise NotImplementedError

    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False) -> np.ndarray:
        sigmas = np.asarray(self.get_sigmas(n), dtype=np.float64)
        if do_append_zero:
            sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=sigmas.dtype)])
        return sigmas[::-1].copy() if flip else sigmas


@dataclasses.dataclass
class EDMDiscretization(Discretization):
    """rho-spaced sigmas from Karras et al. (EDM). discretizer.py:28-39."""

    sigma_min: float = 0.02
    sigma_max: float = 80.0
    rho: float = 7.0

    def get_sigmas(self, n: int) -> np.ndarray:
        ramp = np.linspace(0, 1, n, dtype=np.float64)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho


@dataclasses.dataclass
class LegacyDDPMDiscretization(Discretization):
    """DDPM alphas_cumprod -> sigma = sqrt((1-abar)/abar), sub-sampled.

    discretizer.py:42-69.  This is the discretization used by every shipped
    CCEdit config (DiscreteDenoiser num_idx=1000 + sampler schedules).
    """

    linear_start: float = 0.00085
    linear_end: float = 0.0120
    num_timesteps: int = 1000

    def __post_init__(self):
        self.alphas_cumprod = make_ddpm_alphas_cumprod(
            self.num_timesteps, self.linear_start, self.linear_end
        )

    def get_sigmas(self, n: int) -> np.ndarray:
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            alphas_cumprod = self.alphas_cumprod
        else:
            raise ValueError(
                f"requested {n} sigmas from a {self.num_timesteps}-step DDPM schedule"
            )
        sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        return sigmas[::-1]  # descending


@dataclasses.dataclass
class Img2ImgDiscretizationWrapper(Discretization):
    """Prune the schedule to the lowest ``strength`` fraction of sigmas.

    streamlit_helpers.py:212-233: sigmas (descending) are flipped, the first
    max(int(strength*len), 1) entries kept, flipped back.  Used for img2img /
    sdedit-style partial denoising.
    """

    discretization: Discretization = None
    strength: float = 1.0

    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False) -> np.ndarray:
        if not 0.0 <= self.strength <= 1.0:
            raise ValueError(f"strength must be in [0,1], got {self.strength}")
        sigmas = self.discretization(n, do_append_zero=do_append_zero, flip=flip)
        # work in ascending order, keep the low-sigma prefix
        asc = sigmas[::-1]
        keep = max(int(self.strength * len(asc)), 1)
        return asc[:keep][::-1].copy()


_DISCRETIZATIONS = {
    "edm": EDMDiscretization,
    "legacy_ddpm": LegacyDDPMDiscretization,
}


def make_discretization(name: str, **kwargs) -> Discretization:
    strength: Optional[float] = kwargs.pop("img2img_strength", None)
    disc = _DISCRETIZATIONS[name](**kwargs)
    if strength is not None and strength < 1.0:
        disc = Img2ImgDiscretizationWrapper(discretization=disc, strength=strength)
    return disc
