"""k/v-VMEM-resident spatial attention kernel (transposed layout).

At CCEdit's spatial-attention shapes the whole k/v is tiny — (6144, 40) bf16
is 480 KB — so both fit in VMEM and attention needs no k-blocking at all:
one score block per q-tile, one softmax, one weighted sum.  This kernel
additionally flips the layout to head_dim-in-SUBLANES:

    sT = kT^T q        (contraction over d, scores (n_k, qb) — LANES FULL)
    softmax over axis 0 (vreg-major direction — cheap VPU accumulation)
    oT = vT p          (contraction over n_k, output (d, qb) — NO PAD)

which removes the d=40 -> 128 lane pad from the S@V side entirely (that pad
is what caps the stock flash kernel at ~21% of true-flop roofline,
docs/PERF_r3.md section 5).  Measured v5e, (34,8,6144,40) production shape:

    stock flash (tuned blocks)   38.3 ms
    this kernel, bf16 (exact)    33.1 ms   (1.16x)
    this kernel, int8 QK^T       25.8 ms   (1.49x, cosine 0.99996)

The optional int8 path quantizes q/k per (batch, head) with dynamic symmetric
scales and runs QK^T on the MXU's 2x int8 rate (int8_probe.py: 1.75x on
4096^3) — 7.5 ms vs 14.9 bf16, i.e. 89% of the int8 *padded*-flop roofline.
Softmax (~12 ms VPU) and S@V (~5.6 ms, at true cost) are at their own
ceilings, so ~26 ms is this structure's floor.  Exact bf16 is the default;
int8 changes arithmetic (still fp32 softmax) and is opt-in via
``quantized_qk``.

n_k larger than one score block (CFCA center_self: n_k = 2*6144) runs the
same kernel with an online-softmax loop over k chunks — all chunks' k/v
stay VMEM-resident; only the score buffer is reused.

Parity target (studied, not copied): the reference computes exact fp16/fp32
SDPA via xformers/torch (sgm/modules/attention.py:365-467); bf16 here is the
TPU-equivalent exact path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# score buffer budget: (chunk, qb) fp32 <= ~12.6 MB alongside q/k/v blocks
# for the single-chunk fast path; multi-chunk (online-softmax) runs keep the
# score buffer at <= ~6.3 MB since the loop carry and both operand chunks
# are live alongside it
_MAX_CHUNK = 6144
_MULTI_CHUNK = 3072
_LOG2E = 1.4426950408889634


def _n_chunks(n_k: int) -> int:
    return 1 if n_k <= _MAX_CHUNK else -(-n_k // _MULTI_CHUNK)


def _kernel(sc_ref, q_ref, k_ref, v_ref, o_ref, *, n_chunks: int,
            chunk: int, quant: bool):
    """Refs: sc (1, 1, 1) fp32 logits scale (dequant factors folded in)
             q  (1, D, qb) — int8 when quant else bf16/f32
             k  (1, D, n_k) — same dtype as q
             v  (1, D, n_k)
             o  (1, D, qb)
    """
    qt = q_ref[0]
    c = sc_ref[0, 0, 0] * _LOG2E  # exp(x*scale) == exp2(x*scale*log2e)

    def chunk_at(i):
        kc = k_ref[0, :, pl.ds(i * chunk, chunk)]
        st = jax.lax.dot_general(
            kc, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )  # (chunk, qb)
        s2 = st.astype(jnp.float32) * c
        mc = jnp.max(s2, axis=0, keepdims=True)  # (1, qb)
        return s2, mc

    def weighted_sum(s2, m_cur, i):
        p = jnp.exp2(s2 - m_cur)  # (chunk, qb)
        lc = jnp.sum(p, axis=0, keepdims=True)
        vc = v_ref[0, :, pl.ds(i * chunk, chunk)]
        oc = jax.lax.dot_general(
            vc, p.astype(vc.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, qb)
        return lc, oc

    if n_chunks == 1:
        s2, m = chunk_at(0)
        l, acc = weighted_sum(s2, m, 0)
    else:
        # online softmax over k chunks; fori_loop (not an unrolled python
        # loop) so Mosaic reuses ONE score buffer — unrolling keeps every
        # chunk's (chunk, qb) fp32 scores live and blows scoped VMEM
        def body(i, carry):
            m, l, acc = carry
            s2, mc = chunk_at(i)
            m_new = jnp.maximum(m, mc)
            lc, oc = weighted_sum(s2, m_new, i)
            corr = jnp.exp2(m - m_new)
            return m_new, l * corr + lc, acc * corr + oc
        qb = qt.shape[-1]
        d = qt.shape[0]
        init = (jnp.full((1, qb), -jnp.inf, jnp.float32),
                jnp.zeros((1, qb), jnp.float32),
                jnp.zeros((d, qb), jnp.float32))
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("qb", "interpret"))
def _run(scales, qt, kt, vt, qb: int, interpret: bool):
    """scales: (bh, 1, 1) fp32 per-(batch*head) logits scale.  A (1, 1)
    trailing block equals the array's trailing dims, which Mosaic accepts
    where a sub-tile SMEM block would not."""
    bh, d, n_q = qt.shape
    n_k = kt.shape[2]
    n_chunks = _n_chunks(n_k)
    chunk = n_k // n_chunks
    qspec = pl.BlockSpec((1, d, qb), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, d, n_k), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    scspec = pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _kernel, n_chunks=n_chunks, chunk=chunk,
            quant=qt.dtype == jnp.int8),
        grid=(bh, n_q // qb),
        in_specs=[scspec, qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, d, n_q), vt.dtype),
        interpret=interpret,
    )(scales, qt, kt, vt)


def _pick_qb(n_q: int, n_k: int) -> int:
    # score buffer (chunk, qb) fp32 must stay ~<= 12.6 MB (single-chunk) /
    # ~6.3 MB (multi-chunk: loop carry + operand chunks also live)
    n_chunks = _n_chunks(n_k)
    chunk = max(1, n_k // n_chunks)
    budget = (12.6e6 if n_chunks == 1 else 6.3e6) / 4 / chunk
    for qb in (512, 256, 128):
        if n_q % qb == 0 and qb <= budget:
            return qb
    return 0


def supported(n_q: int, n_k: int, d: int, itemsize: int = 2) -> bool:
    """Shapes this kernel handles better than the stock flash kernel
    (measured: d=40 l0 self-attn and the n_k-doubled CFCA variant).
    ``itemsize`` is the k/v element size in bytes (2 = bf16, the production
    dtype) — the residency gate must not admit fp32 k/v at double the
    footprint it budgeted for."""
    n_chunks = _n_chunks(n_k)
    return (
        n_q >= 512
        and d % 8 == 0
        and d <= 128
        and n_k % n_chunks == 0
        and (n_k // n_chunks) % 128 == 0
        and n_k * d * 2 * itemsize <= 4.0e6   # k+v VMEM residency
        and _pick_qb(n_q, n_k) > 0
    )


def kv_resident_attention(q, k, v, scale: float, quantized_qk: bool = False,
                          interpret: bool = False):
    """Exact (bf16) or int8-QK^T attention over (B, H, N, D) tensors.

    q/k/v: (B, H, N, D); returns (B, H, N_q, D) in q.dtype.
    ``quantized_qk`` quantizes q and k to int8 with per-(B,H) dynamic
    symmetric scales — QK^T runs at the MXU's 2x int8 rate; softmax and S@V
    stay fp32/bf16 and the per-(B,H) dequant factor folds exactly into the
    logits scale (softmax is invariant only to *per-matrix* factors, which
    is what these are).
    """
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    qb = _pick_qb(n_q, n_k)
    out_dtype = q.dtype
    bh = b * h

    def fold_t(x):  # (B,H,N,D) -> (B*H, D, N)
        return jnp.swapaxes(x, 2, 3).reshape(bh, x.shape[3], x.shape[2])

    qt, kt, vt = fold_t(q), fold_t(k), fold_t(v)
    if quantized_qk:
        aq = jnp.maximum(
            jnp.max(jnp.abs(qt.astype(jnp.float32)), axis=(1, 2)), 1e-6)
        ak = jnp.maximum(
            jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=(1, 2)), 1e-6)
        q8 = jnp.clip(
            jnp.round(qt.astype(jnp.float32) * (127.0 / aq)[:, None, None]),
            -127, 127).astype(jnp.int8)
        k8 = jnp.clip(
            jnp.round(kt.astype(jnp.float32) * (127.0 / ak)[:, None, None]),
            -127, 127).astype(jnp.int8)
        scales = (scale * (aq * ak) / (127.0 * 127.0)).reshape(bh, 1, 1)
        ot = _run(scales.astype(jnp.float32), q8, k8, vt, qb, interpret)
    else:
        scales = jnp.full((bh, 1, 1), scale, jnp.float32)
        ot = _run(scales, qt, kt, vt, qb, interpret)
    return jnp.swapaxes(ot.reshape(b, h, d, n_q), 2, 3).astype(out_dtype)
