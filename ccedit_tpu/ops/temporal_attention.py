"""Pallas kernel for short-sequence (temporal) attention.

The pseudo-3D blocks attend over T~17 frame tokens at EVERY spatial position:
q/k/v are (B*H*W, heads, T, d) with a huge batch (12288 at SD-1.5 level 0)
and tiny T/d.  XLA lowers this to ~100k individual (17x17) matmuls plus an
fp32 score tensor whose 17-wide minor dims pad to 128 lanes — measured 14.5ms
on v5e for (12288,8,32,40), i.e. ~1% of roofline, dominated by padded-layout
HBM traffic.

This kernel flips the layout: the folded batch lives in the LANE dimension
and T/d live in the major dimensions, so nothing pads and every multiply-add
is a dense VPU op over 512 lanes.  Scores never touch HBM.  Per grid step it
loads (T, d, NB) tiles of q/k/v, unrolls the T-loop for scores and the
weighted sum, and writes (T, d, NB) out — total HBM traffic is exactly
q+k+v+out.

Measured (v5e, (12288,8,32,40) equivalent): 14.5ms XLA -> ~1.5ms here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t: int):
    # refs: (T, D, NB); batch in lanes
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    rows = []
    for i in range(t):
        # scores for query i against all keys: (T, NB)
        s_i = jnp.sum(q[i][None, :, :] * k, axis=1)
        m = jnp.max(s_i, axis=0, keepdims=True)
        e = jnp.exp(s_i - m)
        a_i = e / jnp.sum(e, axis=0, keepdims=True)          # (T, NB)
        rows.append(jnp.sum(a_i[:, None, :] * v, axis=0))    # (D, NB)
    o_ref[...] = jnp.stack(rows).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_n"))
def _temporal_attention_tdn(q, k, v, scale: float, block_n: int):
    t, d, n = q.shape
    grid = (n // block_n,)
    spec = pl.BlockSpec((t, d, block_n), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, t=t),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((t, d, n), q.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(q, k, v)


def small_seq_attention(q, k, v, scale: float) -> jnp.ndarray:
    """Self-attention for (B, H, T, D) with tiny T (<= ~32) and huge B.

    Requires q/k/v token counts equal (self-attention over frames).  The
    batch*heads product is padded up to the lane block internally."""
    b, h, t, d = q.shape
    n = b * h

    def to_tdn(x):
        return x.reshape(n, t, d).transpose(1, 2, 0)

    # lane-block sized to keep the double-buffered bf16 blocks plus the
    # kernel's fp32 casts inside scoped VMEM (16MB).  The live set scales
    # with t*d (several fp32 (T,D,NB) temps + the unrolled score rows):
    # t=32,d=40 at block 512 measured 22.4MB scoped -> OOM, so halve the
    # lane block once t*d crosses the t=17-ish budget.
    if t * d <= 20 * 48:
        block_n = 512 if d <= 48 else 256
    elif d <= 96:
        block_n = 256
    else:
        block_n = 128
    pad = (-n) % block_n
    qt, kt, vt = to_tdn(q), to_tdn(k), to_tdn(v)
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad)))
    out = _temporal_attention_tdn(qt, kt, vt, float(scale), block_n)
    if pad:
        out = out[:, :, :n]
    return out.transpose(2, 0, 1).reshape(b, h, t, d)
