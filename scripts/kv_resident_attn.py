#!/usr/bin/env python
"""Experiment: single-pass k/v-VMEM-resident spatial attention kernel.

Motivation (2026-08-17, supersedes part of PERF_r3.md section 5): the round-3
"K=40 costs >= K=128" measurement was bound by the 20.5 GB score-matrix HBM
write, not the MXU — with the score write fused away, XLA runs the K=40
contraction at 86% of TRUE-flop efficiency (int8_probe.py part 2: 4.85 ms vs
26.8 ms materialized).  d=40 is sublane-aligned (5x8), so the systolic array
streams the short contraction at true cost.  The stock flash kernel's 42 ms
must therefore be online-softmax VPU overhead + Mosaic layout cost, not an
MXU-format ceiling.

At SD-1.5 l0 the whole k/v is 6144x40 bf16 = 480 KB — it FITS IN VMEM.  So a
single-pass kernel (no k-blocking, no online rescaling) is possible:
  s = q_blk @ k^T  (fp32, VMEM)   -> softmax rows -> (p @ v) / l
Variants here isolate where the time goes:
  qkt      : dot only, row-sum output      (MXU cost of the K=40 contraction)
  softmax  : dot + softmax, row-sum output (adds the VPU cost)
  full     : the complete attention        (adds S@V + output write)
  stock    : jax.experimental flash with the production block sweep

Run: python scripts/kv_resident_attn.py [qb...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, N, D = 272, 6144, 40  # (34 clips x 8 heads), 64x96 tokens, head_dim
SCALE = D ** -0.5


def bench(name, fn, *args, i1=3, i2=9, n=3, note=""):
    def make(iters):
        def looped(*a):
            def body(_, carry):
                out = fn(carry, *a[1:])
                eps = (out.astype(jnp.float32).ravel()[0] * 1e-20)
                return carry + eps.astype(carry.dtype)
            return jax.lax.fori_loop(0, iters, body, a[0])
        return jax.jit(looped)

    f1, f2 = make(i1), make(i2)
    jax.device_get(jnp.ravel(f1(*args))[0])
    jax.device_get(jnp.ravel(f2(*args))[0])

    def t(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.device_get(jnp.ravel(f(*args))[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(f2) - t(f1)) * 1e3 / (i2 - i1)
    print(f"{name:46s} {ms:8.2f} ms  {note}", flush=True)
    return ms


# ---------------------------------------------------------------- kernels
def _qkt_kernel(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = jnp.sum(s, axis=1, keepdims=True)


def _softmax_kernel(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * SCALE
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    o_ref[0] = jnp.sum(p, axis=1, keepdims=True)


def _full_kernel(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * SCALE
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _qkt_tr_kernel(qt_ref, kt_ref, o_ref):
    # qt (1, D, qb), kt (1, D, N): contraction over SUBLANES (D=40=5x8);
    # output sT (N, qb) has full 128+ lanes — no pad anywhere
    st = jax.lax.dot_general(
        kt_ref[0], qt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (N, qb)
    o_ref[0] = jnp.sum(st, axis=0, keepdims=True)


def _full_tr_kernel(qt_ref, kt_ref, vt_ref, o_ref):
    st = jax.lax.dot_general(
        kt_ref[0], qt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (N, qb)
    st = st * SCALE
    m = jnp.max(st, axis=0, keepdims=True)   # reduce over vreg-major axis
    p = jnp.exp(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    ot = jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (D, qb): contraction over N
    o_ref[0] = (ot / l).astype(o_ref.dtype)


def _qkt8_tr_kernel(qt_ref, kt_ref, o_ref):
    # int8 q/k, contraction over sublanes (d=40)
    st = jax.lax.dot_general(
        kt_ref[0], qt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (N, qb)
    o_ref[0] = jnp.sum(st.astype(jnp.float32), axis=0, keepdims=True)


def _full8_tr_kernel(qt_ref, kt_ref, vt_ref, o_ref, *, sq, sk):
    st = jax.lax.dot_general(
        kt_ref[0], qt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    s = st.astype(jnp.float32) * (sq * sk * SCALE)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    ot = jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (ot / l).astype(o_ref.dtype)


def make_tr8_call(kind, qb, sq=1.0, sk=1.0):
    qspec = pl.BlockSpec((1, D, qb), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, D, N), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    grid = (B, N // qb)
    if kind == "qkt":
        return pl.pallas_call(
            _qkt8_tr_kernel, grid=grid, in_specs=[qspec, kvspec],
            out_specs=pl.BlockSpec((1, 1, qb), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32))
    import functools as ft
    return pl.pallas_call(
        ft.partial(_full8_tr_kernel, sq=sq, sk=sk),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, D, N), jnp.bfloat16))


def make_tr_call(kind, qb):
    qspec = pl.BlockSpec((1, D, qb), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, D, N), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    grid = (B, N // qb)
    if kind == "qkt":
        return pl.pallas_call(
            _qkt_tr_kernel, grid=grid, in_specs=[qspec, kvspec],
            out_specs=pl.BlockSpec((1, 1, qb), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32))
    return pl.pallas_call(
        _full_tr_kernel, grid=grid, in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, D, N), jnp.bfloat16))


def make_call(kind, qb):
    qspec = pl.BlockSpec((1, qb, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    grid = (B, N // qb)
    if kind == "qkt":
        return pl.pallas_call(
            _qkt_kernel, grid=grid, in_specs=[qspec, kvspec],
            out_specs=pl.BlockSpec((1, qb, 1), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, 1), jnp.float32))
    if kind == "softmax":
        return pl.pallas_call(
            _softmax_kernel, grid=grid, in_specs=[qspec, kvspec],
            out_specs=pl.BlockSpec((1, qb, 1), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, 1), jnp.float32))
    return pl.pallas_call(
        _full_kernel, grid=grid, in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16))


def run_int8(q, k, v):
    """int8 QK^T variants (tr layout): quantize q/k per-tensor, measure, and
    report accuracy vs the bf16 stock path."""
    from ccedit_tpu.ops.attention import dot_product_attention

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    sq = float(jnp.max(jnp.abs(qt)).astype(jnp.float32)) / 127.0
    sk = float(jnp.max(jnp.abs(kt)).astype(jnp.float32)) / 127.0
    q8 = jnp.clip(jnp.round(qt.astype(jnp.float32) / sq), -127, 127).astype(jnp.int8)
    k8 = jnp.clip(jnp.round(kt.astype(jnp.float32) / sk), -127, 127).astype(jnp.int8)
    for qb in (256, 512):
        try:
            f = jax.jit(make_tr8_call("qkt", qb))
            bench(f"tr-int8 qkt  qb={qb}", lambda a, b: f(a, b), q8, k8)
            g = jax.jit(make_tr8_call("full", qb, sq=sq, sk=sk))
            bench(f"tr-int8 full qb={qb}", lambda a, b, c: g(a, b, c),
                  q8, k8, vt)
        except Exception as e:
            print(f"int8 qb={qb} FAILED: {type(e).__name__}: {str(e)[:160]}")
    g = jax.jit(make_tr8_call("full", 256, sq=sq, sk=sk))
    out_t = g(q8, k8, vt)
    out = jnp.swapaxes(out_t, 1, 2).reshape(34, 8, N, D).astype(jnp.float32)
    ref = dot_product_attention(
        q.reshape(34, 8, N, D), k.reshape(34, 8, N, D),
        v.reshape(34, 8, N, D)).astype(jnp.float32)
    cos = jnp.sum(out * ref) / (jnp.linalg.norm(out) * jnp.linalg.norm(ref))
    print(f"int8 vs bf16: cosine={float(cos):.6f} "
          f"max|diff|={float(jnp.max(jnp.abs(out - ref))):.4f}")


def main():
    if sys.argv[1:] == ["int8"]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, N, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), jnp.bfloat16)
        print(f"# device: {jax.devices()[0]}  int8 variants")
        run_int8(q, k, v)
        return
    qbs = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), jnp.bfloat16)
    print(f"# device: {jax.devices()[0]}  shape ({B},{N},{D}) "
          "true-flop QK^T floor 4.2ms, each dot 4.2ms @197TF")

    # stock flash baseline at the production blocks
    from ccedit_tpu.ops.attention import dot_product_attention
    qh = q.reshape(34, 8, N, D)
    bench("stock flash (production path)",
          lambda qq: dot_product_attention(qq, qq, qq), qh)

    for qb in qbs:
        try:
            for kind in ("qkt", "softmax", "full"):
                f = jax.jit(make_call(kind, qb))
                if kind == "full":
                    bench(f"kv-resident {kind:8s} qb={qb}",
                          lambda qq, kk, vv: f(qq, kk, vv), q, k, v)
                else:
                    bench(f"kv-resident {kind:8s} qb={qb}",
                          lambda qq, kk: f(qq, kk), q, k)
        except Exception as e:
            print(f"qb={qb} {kind} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    qt = jnp.swapaxes(q, 1, 2)  # (B, D, N)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    for qb in qbs:
        try:
            for kind in ("qkt", "full"):
                f = jax.jit(make_tr_call(kind, qb))
                if kind == "full":
                    bench(f"tr-layout  {kind:8s} qb={qb}",
                          lambda qq, kk, vv: f(qq, kk, vv), qt, kt, vt)
                else:
                    bench(f"tr-layout  {kind:8s} qb={qb}",
                          lambda qq, kk: f(qq, kk), qt, kt)
        except Exception as e:
            print(f"tr qb={qb} {kind} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}")
    # tr correctness
    try:
        f = jax.jit(make_tr_call("full", 256))
        out_t = f(qt, kt, vt)  # (B, D, N)
        out2 = jnp.swapaxes(out_t, 1, 2).reshape(34, 8, N, D)
        ref2 = dot_product_attention(
            q.reshape(34, 8, N, D), k.reshape(34, 8, N, D),
            v.reshape(34, 8, N, D))
        err2 = jnp.max(jnp.abs(out2.astype(jnp.float32) -
                               ref2.astype(jnp.float32)))
        print(f"max |tr-layout - stock flash| = {float(err2):.4f}")
    except Exception as e:
        print(f"tr correctness FAILED: {type(e).__name__}: {str(e)[:160]}")

    # correctness of the full kernel
    f = jax.jit(make_call("full", 256))
    out = f(q, k, v).reshape(34, 8, N, D)
    ref = dot_product_attention(qh, qh, qh)  # not same inputs; recompute
    ref = dot_product_attention(
        q.reshape(34, 8, N, D), k.reshape(34, 8, N, D),
        v.reshape(34, 8, N, D))
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"max |kv-resident - stock flash| = {float(err):.4f}")


if __name__ == "__main__":
    main()
