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
    """(B*T, H, W, C) -> (H*B*W, T, C) — temporal rows in H-MAJOR order.

    The folded batch is h-major (row r holds (h, b, w) = (r // (B*W),
    (r // W) % B, r % W)) so that a height-sharded clip (parallel/sampling
    axis 2, the production 17-frame path) stays uniformly sharded through
    the fold: with the b-major order each device's rows interleave across
    the flat axis and GSPMD materializes full all-gathers at every temporal
    boundary (measured 5.1 of 9.1 GB collective traffic per 5-row program,
    docs/PERF_r3.md §7).  Temporal ops treat rows independently, so the
    order is free; `repeat_ctx_temporal` aligns per-sample context."""
    bt, h, w, c = x.shape
    t = bt // batch
    x = x.reshape(batch, t, h, w, c)
    x = jnp.transpose(x, (2, 0, 3, 1, 4))  # (H, B, W, T, C)
    return x.reshape(batch * h * w, t, c)


def temporal_to_tokens(x: jnp.ndarray, batch: int, h: int, w: int) -> jnp.ndarray:
    """(H*B*W, T, C) -> (B*T, H, W, C) — inverse of ``tokens_to_temporal``."""
    bhw, t, c = x.shape
    x = x.reshape(h, batch, w, t, c)
    x = jnp.transpose(x, (1, 3, 0, 2, 4))  # (B, T, H, W, C)
    return x.reshape(batch * t, h, w, c)


def repeat_ctx_temporal(context: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Expand per-sample context (B, L, D) to one row per temporal-layout
    row, matching ``tokens_to_temporal``'s h-major order."""
    inner = jnp.repeat(context, w, axis=0)       # (B*W, L, D), b-major
    return jnp.tile(inner, (h, 1, 1))            # (H*B*W, L, D)
