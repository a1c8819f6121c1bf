"""Layout transforms for the pseudo-3D factorization.

The reference's fundamental idiom (spatial_temporal_forward,
sgm/modules/diffusionmodules/openaimodel.py:129-178) folds video tensors
between three layouts for 2D-spatial vs 1D-temporal ops.  TPU-native layout is
channels-last:

  video   : (B, T, H, W, C)
  spatial : (B*T, H, W, C)     — a free reshape (leading axes merge)
  temporal: (B*H*W, T, C)      — one transpose (T moves inward), cheap vs convs
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, C)."""
    b, t, h, w, c = x.shape
    return x.reshape(b * t, h, w, c)


def unfold_time(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B*T, H, W, C) -> (B, T, H, W, C)."""
    bt, h, w, c = x.shape
    return x.reshape(batch, bt // batch, h, w, c)


def tokens_to_temporal(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B*T, H, W, C) -> (B*H*W, T, C)."""
    bt, h, w, c = x.shape
    t = bt // batch
    x = x.reshape(batch, t, h, w, c)
    x = jnp.transpose(x, (0, 2, 3, 1, 4))  # (B, H, W, T, C)
    return x.reshape(batch * h * w, t, c)


def temporal_to_tokens(x: jnp.ndarray, batch: int, h: int, w: int) -> jnp.ndarray:
    """(B*H*W, T, C) -> (B*T, H, W, C)."""
    bhw, t, c = x.shape
    x = x.reshape(batch, h, w, t, c)
    x = jnp.transpose(x, (0, 3, 1, 2, 4))  # (B, T, H, W, C)
    return x.reshape(batch * t, h, w, c)
