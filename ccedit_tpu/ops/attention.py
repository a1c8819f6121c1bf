"""Scaled-dot-product attention with a single TPU dispatch point.

Replaces the reference's CUDA attention zoo (xformers / torch SDPA /
flash_attn selection, sgm/modules/attention.py:13-74,365-595) with one
function.  On TPU with large token counts the Pallas flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention) avoids materializing the
(N x N) score matrix in HBM — the dominant memory cost of the spatial
self-attention at 512x768/f8 (6144 tokens).  Everywhere else XLA's fused
softmax-attention is already near-optimal; we route through one entry point so
the policy lives in one place.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=None)
def _flash_fn():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def _xla_attention(q, k, v, scale):
    # q,k,v: (B, H, N, D) — fp32 softmax accumulation regardless of input dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _flash_ok(q, k) -> bool:
    """Conservative gate for the Pallas kernel: big token counts, TPU backend,
    block-friendly lengths. Small sequences (temporal T=17, text L=77) stay on
    the XLA path where the kernel's block minimums would force heavy padding."""
    if not _is_tpu():
        return False
    n_q, n_k = q.shape[-2], k.shape[-2]
    return n_q >= 512 and n_k >= 512 and n_q % 128 == 0 and n_k % 128 == 0


def _largest_divisor(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 128


def _flash_blocks(n_q: int, n_k: int, d: int):
    """Tuned block sizes: the kernel defaults (128-cubed) run ~5x slower than
    1024/2048 blocks at SD-1.5's 6144-token spatial attention (measured on
    v5e: 352ms -> 72ms for (34,8,6144,40)).  Blocks shrink with head_dim to
    stay inside VMEM (the VAE's single-head d=512 attention OOMs otherwise)."""
    fa = _flash_fn()
    if d <= 64:
        bq, bkm, bk = 1024, 2048, 1024
    elif d <= 128:
        bq, bkm, bk = 512, 1024, 512
    elif d <= 256:
        bq, bkm, bk = 256, 512, 256
    else:
        bq, bkm, bk = 128, 256, 128
    return fa.BlockSizes(
        block_q=_largest_divisor(n_q, (bq, 512, 256, 128)),
        block_k_major=_largest_divisor(n_k, (bkm, 1024, 512, 256, 128)),
        block_k=_largest_divisor(n_k, (bk, 512, 256, 128)),
        block_b=1,
    )


# ---------------------------------------------------------------------------
# mesh context: multi-chip clip sharding
# ---------------------------------------------------------------------------
# GSPMD cannot partition a pallas_call, so under clip-sharded sampling the
# flash kernel must be wrapped in shard_map: either the attention batch (the
# folded frame axis) or the query-token axis (clip height sharding) is split
# over the mesh's data axis, k/v replicated.  Set via `mesh_context`.

_MESH_CTX = {"mesh": None, "axis": "data"}


class mesh_context:
    """with mesh_context(plan.mesh): ... — route big attentions through
    shard_map so the Pallas kernel composes with clip sharding."""

    def __init__(self, mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis

    def __enter__(self):
        self._prev = dict(_MESH_CTX)
        _MESH_CTX["mesh"] = self.mesh
        _MESH_CTX["axis"] = self.axis
        return self

    def __exit__(self, *exc):
        _MESH_CTX.update(self._prev)
        return False


def _small_seq_ok(q, k) -> bool:
    """Gate for the short-sequence (temporal) pallas kernel: tiny token count
    over a huge folded batch — XLA pads the 17-wide fp32 score minors to 128
    lanes and crawls (14.5ms at SD-1.5 level 0 on v5e; the kernel runs the
    same op in 6.5ms with scores never leaving VMEM)."""
    if not _is_tpu():
        return False
    n_q, n_k = q.shape[-2], k.shape[-2]
    return (n_q == n_k and n_q <= 32 and q.shape[0] * q.shape[1] >= 2048
            and q.shape[-1] <= 256)


# ---------------------------------------------------------------------------
# int8-QK^T opt-in: quantized attention trades exactness (cosine ~0.99996 on
# the production shapes) for a 1.49x spatial-attention speedup.  Enabled per
# process via set_quantized_qk(), CCEDIT_QUANT_QK=1, or the umbrella
# CCEDIT_INT8=1 (which also enables the W8A8 conv/dense path, ops/quant.py).
# Read once, lazily.
_QUANT = {"qk": None}


def set_quantized_qk(enabled: bool) -> None:
    _QUANT["qk"] = bool(enabled)


def quantized_qk_enabled() -> bool:
    if _QUANT["qk"] is None:
        import os

        _QUANT["qk"] = (
            os.environ.get("CCEDIT_QUANT_QK", "") not in ("", "0")
            or os.environ.get("CCEDIT_INT8", "") not in ("", "0")
        )
    return _QUANT["qk"]


def _kv_resident_ok(q, k) -> bool:
    """Gate for the k/v-VMEM-resident transposed-layout kernel — beats the
    stock flash kernel at every eligible production shape (measured v5e,
    bf16/int8 vs stock): l0 (34,8,6144,40) 33.8/28.2 vs 39.0; CFCA
    n_k=12288 66.9/57.1 vs 75.1; l1 (34,8,1536,80) 2.5/2.1 vs 3.0."""
    if not _is_tpu():
        return False
    from . import spatial_attention as sa

    n_q, n_k, d = q.shape[-2], k.shape[-2], q.shape[-1]
    return sa.supported(n_q, n_k, d, itemsize=k.dtype.itemsize)


# The custom pallas kernels are forward-only; training differentiates
# through dot_product_attention, so each gets a custom VJP whose backward
# recomputes the mathematically identical attention and differentiates THAT
# (one extra forward in the bwd pass — the standard save-inputs/recompute
# flash-attention trade, without hand-writing bwd kernels).  At flash-
# eligible shapes the recompute routes through the stock pallas
# flash_attention, whose own fwd/bwd kernels never materialize the (N x N)
# score matrix — differentiating the plain-einsum attention at the 3072+
# token spatial shapes allocates a 3.4 GB fp32 score temp and OOMs a 16 GB
# chip.  Tiny (temporal) shapes use the einsum path, where the score temp
# is a few MB.
def _xla_attention_bwd(scale, res, g):
    q, k, v = res
    if _flash_ok(q, k):
        # default BlockSizes: the tuned fwd-only blocks from _flash_blocks
        # lack the bwd block specs the kernel's VJP requires; the defaults
        # carry both and every _flash_ok shape is %128
        fa = _flash_fn()
        ref = lambda qq, kk, vv: fa.flash_attention(
            qq, kk, vv, causal=False, sm_scale=scale)
    else:
        ref = lambda qq, kk, vv: _xla_attention(qq, kk, vv, scale)
    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _kv_resident_diff(q, k, v, scale, quantized):
    from .spatial_attention import kv_resident_attention

    return kv_resident_attention(q, k, v, scale, quantized_qk=quantized)


_kv_resident_diff.defvjp(
    lambda q, k, v, scale, quantized:
        (_kv_resident_diff(q, k, v, scale, quantized), (q, k, v)),
    lambda scale, quantized, res, g: _xla_attention_bwd(scale, res, g),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    # the tuned fwd blocks (_flash_blocks) lack the bwd block specs the
    # stock kernel's own VJP requires, so differentiating the bare
    # flash_attention call raises at trace time — route bwd through the
    # shared recompute (which uses default BlockSizes carrying bwd specs)
    fa = _flash_fn()
    return fa.flash_attention(
        q, k, v, causal=False, sm_scale=scale,
        block_sizes=_flash_blocks(q.shape[-2], k.shape[-2], q.shape[-1]),
    )


_flash_diff.defvjp(
    lambda q, k, v, scale: (_flash_diff(q, k, v, scale), (q, k, v)),
    _xla_attention_bwd,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _small_seq_diff(q, k, v, scale):
    from .temporal_attention import small_seq_attention

    return small_seq_attention(q, k, v, scale)


_small_seq_diff.defvjp(
    lambda q, k, v, scale: (_small_seq_diff(q, k, v, scale), (q, k, v)),
    _xla_attention_bwd,
)


def _attention_kernel(q, k, v, scale, force_xla):
    # NOTE (r3): a small-KV pallas kernel for the 77-token text cross-attn
    # (scores VMEM-resident) was built, measured 4.7-6.2 ms vs XLA's true
    # 2.3 ms at (34,8,6144,40)x77, and removed — the ~30 us/grid-step pallas
    # floor dominates an op this thin.  See docs/PERF_r3.md §6.
    if not force_xla and _kv_resident_ok(q, k):
        return _kv_resident_diff(q, k, v, scale, quantized_qk_enabled())
    if not force_xla and _flash_ok(q, k):
        return _flash_diff(q, k, v, scale)
    if not force_xla and _small_seq_ok(q, k):
        return _small_seq_diff(q, k, v, scale)
    return _xla_attention(q, k, v, scale)


def _sharded_attention(q, k, v, scale, force_xla, mesh, axis):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    kern = lambda qq, kk, vv: _attention_kernel(qq, kk, vv, scale, force_xla)
    if q.shape[0] % n == 0:
        # batch sharding: the folded (b t) axis for spatial attention, or
        # the folded (b h w) axis for temporal attention under clip sharding
        spec = P(axis, None, None, None)
        fn = shard_map(kern, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
        return fn(q, k, v)
    if q.shape[2] % n == 0 and q.shape[2] // n >= 128:
        # token sharding (clip height axis): q rows local, k/v gathered
        qspec = P(None, None, axis, None)
        fn = shard_map(kern, mesh=mesh, in_specs=(qspec, P(), P()),
                       out_specs=qspec)
        return fn(q, k, v)
    # no clean split: GSPMD cannot partition a pallas_call, so fall back to
    # the plain-einsum path which it CAN shard
    return _xla_attention(q, k, v, scale)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Multi-head SDPA over (B, H, N, D) tensors.

    scale defaults to D**-0.5 (the reference's CrossAttention scale,
    attention.py:390).
    """
    if scale is None:
        scale = float(np.asarray(q.shape[-1], dtype=np.float64) ** -0.5)
    mesh = _MESH_CTX["mesh"]
    if mesh is not None and (q.shape[-2] >= 512 or _small_seq_ok(q, k)):
        # any pallas-eligible attention must run under shard_map when a mesh
        # is active — GSPMD cannot partition pallas_call operands
        return _sharded_attention(q, k, v, scale, force_xla, mesh,
                                  _MESH_CTX["axis"])
    return _attention_kernel(q, k, v, scale, force_xla)
