"""Shared primitive layers for the UNet / ControlNet / VAE stacks.

Counterparts of sgm/modules/diffusionmodules/util.py (timestep_embedding,
zero_module, conv_nd/normalization helpers), re-expressed as flax.linen
idioms in channels-last layout.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import zeros as zeros_init

Dtype = Any


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [cos | sin] ordering.

    Matches diffusionmodules/util.py timestep_embedding: freqs =
    exp(-ln(max_period) * arange(half)/half), emb = cat([cos, sin]).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class ZeroConv(nn.Module):
    """Zero-initialized convolution — the ControlNet / temporal-layer idiom
    (zero_module, diffusionmodules/util.py): output is exactly 0 at init so a
    freshly-added branch is an identity perturbation."""

    features: int
    kernel_size: Sequence[int] = (1, 1)
    strides: Optional[Sequence[int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            padding="SAME",
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class ZeroDense(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=zeros_init,
            bias_init=zeros_init,
            dtype=self.dtype,
            name="dense",
        )(x)


def group_norm(x, *, groups: int = 32, eps: float = 1e-5, dtype=jnp.float32, name=None):
    """Functional wrapper is not possible in linen; use GroupNorm module."""
    raise NotImplementedError("use nn.GroupNorm directly")


class TimeEmbed(nn.Module):
    """time_embed MLP: Dense(4*ch) -> SiLU -> Dense(4*ch).

    openaimodel.py UNetModel.time_embed (:1216-1223)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.features, dtype=self.dtype, name="dense1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.features, dtype=self.dtype, name="dense2")(emb)
        return emb
