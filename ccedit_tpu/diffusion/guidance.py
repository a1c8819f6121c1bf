"""Classifier-free guidance.

Parity target: sgm/modules/diffusionmodules/guiders.py.

TPU-first redesign: the reference concatenates uc/c dicts *every denoiser
call* inside the sampler loop (guiders.py:31-40).  Here the conditioning dict
is concatenated **once** before the jitted sampling scan (it is constant across
steps); each step only doubles x and sigma, which XLA fuses for free.

Keys doubled for CCEdit's video path (VanillaCFGTV2V, guiders.py:56-67):
vector / crossattn / concat / cond_feat / control_hint / interpolate_*.
Other keys must be identical between c and uc and are passed through.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

DOUBLED_KEYS = (
    "vector",
    "crossattn",
    "concat",
    "cond_feat",
    "control_hint",
    "interpolate_first",
    "interpolate_last",
    "interpolate_first_last",
    "ref_context",  # CFCA reference-bank context (our explicit redesign of the hook hack)
)


class IdentityGuider:
    """No guidance: single forward per step. guiders.py:43-53."""

    num_forward_batches = 1

    def prepare_cond(self, cond: Dict, uc: Dict | None) -> Dict:
        return dict(cond)

    def expand(self, x: jnp.ndarray, sigma: jnp.ndarray):
        return x, sigma

    def combine(self, out: jnp.ndarray, sigma: jnp.ndarray,
                scale=None) -> jnp.ndarray:
        return out


class VanillaCFG:
    """Batch-doubled classifier-free guidance: [uc; c] on the batch axis,
    ``uncond + scale * (cond - uncond)``. guiders.py:8-40 (+TV2V key set)."""

    num_forward_batches = 2

    def __init__(self, scale: float = 7.5):
        self.scale = scale

    def prepare_cond(self, cond: Dict, uc: Dict | None) -> Dict:
        if uc is None:
            uc = cond
        out = {}
        for k, v in cond.items():
            if k in DOUBLED_KEYS:
                out[k] = jnp.concatenate([uc[k], v], axis=0)
            else:
                out[k] = v
        return out

    def expand(self, x: jnp.ndarray, sigma: jnp.ndarray):
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([sigma, sigma], axis=0),
        )

    def combine(self, out: jnp.ndarray, sigma: jnp.ndarray,
                scale=None) -> jnp.ndarray:
        """``scale`` may be a traced scalar overriding the constructor value:
        the sampling CLIs pass --cfg_scale as a jit ARGUMENT so a user
        sweeping guidance strength reuses one compiled program instead of
        paying a fresh XLA compile per value."""
        x_u, x_c = jnp.split(out, 2, axis=0)
        s = self.scale if scale is None else scale
        return x_u + s * (x_c - x_u)


_GUIDERS = {"identity": IdentityGuider, "cfg": VanillaCFG, "cfg_tv2v": VanillaCFG}


def make_guider(name: str = "cfg", **kwargs):
    return _GUIDERS[name](**kwargs)
