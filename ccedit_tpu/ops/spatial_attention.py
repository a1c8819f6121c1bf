"""Pallas kernel for the SD-scale spatial self-attention (small head dim).

The generic flash kernel runs the (34,8,6144,40) spatial attention at ~21%
of roofline on v5e: with d=40 both matmuls pad the head dim to 128 lanes
(hard 31% ceiling on QK^T), and the online-softmax bookkeeping costs the
rest.  This kernel exploits what flash cannot assume: at SD-1.5 scale the
ENTIRE k/v row for one (batch, head) fits in VMEM (6144x40 bf16 = 0.5MB
each), so there is no need for streaming statistics at all:

  per (b*h, q-block) grid step:
    scores = q_blk @ k^T          (d-padded matmul — unavoidable 31% eff)
    probs  = softmax(scores)      (full row in VMEM, single pass)
    out    = probs @ v            (contraction over N=6144 — FULL MXU eff)

k/v blocks are indexed only by the grid's major axis, so pallas keeps them
resident across the q-block sweep.  Gated for n_k <= 8192, d <= 128,
non-causal (the shapes the UNet/ControlNet spatial layers produce).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    k = k_ref[0].astype(jnp.float32)                  # (N, D)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (BQ, N)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (BQ, D)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _attention_gnd(q, k, v, scale: float, block_q: int):
    g, n_q, d = q.shape
    n_k = k.shape[1]
    grid = (g, n_q // block_q)
    qspec = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, n_k, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((g, n_q, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def spatial_attention(q, k, v, scale: float, block_q: int = 256) -> jnp.ndarray:
    """Attention over (B, H, N_q, D) with k/v rows resident in VMEM.
    Requires N_q % block_q == 0 (callers route via ops.attention's gate)."""
    b, h, n_q, d = q.shape
    g = b * h

    def fold(x):
        return x.reshape(g, x.shape[2], d)

    out = _attention_gnd(fold(q), fold(k), fold(v), float(scale), block_q)
    return out.reshape(b, h, n_q, d)
