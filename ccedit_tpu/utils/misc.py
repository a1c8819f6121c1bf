"""Small pure helpers shared across the framework.

Counterparts of the reference's ``sgm/util.py`` helpers (append_dims at
sgm/util.py, default/exists idioms used throughout), re-expressed for jnp.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, TypeVar

import jax.numpy as jnp

T = TypeVar("T")


def exists(x: Any) -> bool:
    return x is not None


def default(val: Optional[T], d: T | Callable[[], T]) -> T:
    if val is not None:
        return val
    return d() if callable(d) else d


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims until ``x.ndim == target_ndim``.

    Used to broadcast per-batch sigma scalars over (B, T, H, W, C) tensors,
    mirroring the reference's ``append_dims`` (sgm/util.py).
    """
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def expand_dims_like(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return append_dims(x, y.ndim)


def as_float_frames(x, dtype=None) -> jnp.ndarray:
    """Accept uint8 pixels anywhere [-1,1] video frames are expected.

    Decoders emit uint8 natively and uint8 ships 4x fewer bytes over a slow
    host->device link (PERF_r3 §16), so the pipeline keeps clips quantized
    until the device edge; this dequantizes there.  Float inputs pass
    through (optionally cast)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return x.astype(dtype or jnp.float32) / 127.5 - 1.0
    return x if dtype is None else x.astype(dtype)
