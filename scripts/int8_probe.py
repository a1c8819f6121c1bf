#!/usr/bin/env python
"""Feasibility probe: is v5e's 2x int8 MXU rate reachable from JAX?

Questions this answers (slope-timed, see profile_r3.py rationale):
  1. Peak ratio: int8xint8->int32 dot vs bf16 dot at a large square matmul.
  2. The attention QK^T shape (272 batch, 6144x6144, K=40/128): does int8
     beat the bf16 d-pad ceiling (PERF_r3.md section 5)?
  3. int8 3x3 conv at the ResBlock l0 shape vs bf16.
  4. Pallas: does a Mosaic int8 dot inside a kernel hit the MXU int8 rate?

Run: python scripts/int8_probe.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PEAK_BF16 = 197e12


def bench(name, fn, *args, i1=5, i2=25, n=3, flops=None):
    """First positional arg is the carry: body runs out = fn(carry, *rest)
    and feeds a data-dependent (runtime-zero) perturbation of `out` back into
    the carry so XLA cannot hoist the op out of the loop."""
    def make(iters):
        def looped(*a):
            def body(_, carry):
                out = fn(carry, *a[1:])
                eps = (out.astype(jnp.float32).mean() * 1e-20)
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
    eff = f"  eff_bf16peak={flops / PEAK_BF16 / (ms / 1e3) * 100:5.1f}%" if flops else ""
    print(f"{name:58s} {ms:9.3f} ms{eff}", flush=True)
    return ms


def part_peak(key):
    print("\n## 1. peak: 4096^3 matmul")
    n = 4096
    a8 = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
    abf = jax.random.normal(key, (n, n), jnp.bfloat16)
    fl = 2.0 * n * n * n
    bench("bf16 4096^3", lambda a, b: jnp.dot(a, b), abf, abf, flops=fl)
    bench("int8 4096^3 -> int32",
          lambda a, b: jax.lax.dot_general(
              a, b, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.int32), a8, b8, flops=fl)
    # mixed precision: int8 weights, bf16 activations (weight-only quant)
    bench("bf16 x int8->bf16 4096^3 (w8 cast in-graph)",
          lambda a, b: jnp.dot(a, b.astype(jnp.bfloat16)), abf, b8, flops=fl)


def part_qkt(key):
    print("\n## 2. attention QK^T (272,6144,K)@(272,K,6144)")
    for K in (40, 128):
        q8 = jax.random.randint(key, (272, 6144, K), -127, 127, jnp.int8)
        qb = jax.random.normal(key, (272, 6144, K), jnp.bfloat16)
        fl = 2.0 * 272 * 6144 * 6144 * K
        bench(f"bf16 K={K}", lambda a, b: jnp.einsum(
            "bqk,bdk->bqd", a, b, preferred_element_type=jnp.float32),
            qb, qb, flops=fl)
        bench(f"int8 K={K} -> int32", lambda a, b: jnp.einsum(
            "bqk,bdk->bqd", a, b, preferred_element_type=jnp.int32),
            q8, q8, flops=fl)


def part_conv(key):
    print("\n## 3. conv3x3 l0 (34,64,96,320)")
    x8 = jax.random.randint(key, (34, 64, 96, 320), -127, 127, jnp.int8)
    xb = jax.random.normal(key, (34, 64, 96, 320), jnp.bfloat16)
    w8 = jax.random.randint(key, (3, 3, 320, 320), -127, 127, jnp.int8)
    wb = jax.random.normal(key, (3, 3, 320, 320), jnp.bfloat16)
    fl = 2.0 * 34 * 64 * 96 * 320 * 320 * 9
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    bench("bf16 conv3x3", lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn), xb, wb, flops=fl)
    try:
        bench("int8 conv3x3 -> int32", lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32), x8, w8, flops=fl)
    except Exception as e:
        print(f"int8 conv FAILED: {type(e).__name__}: {e}")
    # im2col formulation: patches @ reshaped kernel as a plain int8 matmul
    def im2col_conv(x, w):
        pat = jax.lax.conv_general_dilated_patches(
            x.astype(jnp.int8), (3, 3), (1, 1), "SAME",
            dimension_numbers=dn)
        # patches: (N,H,W, C*9) ; w: (3,3,I,O) -> (C*9, O)
        wf = w.transpose(2, 0, 1, 3).reshape(-1, w.shape[-1])
        return jax.lax.dot_general(
            pat, wf, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    try:
        bench("int8 im2col conv3x3 -> int32", im2col_conv, x8, w8, flops=fl)
    except Exception as e:
        print(f"int8 im2col FAILED: {type(e).__name__}: {e}")


def part_pallas(key):
    print("\n## 4. pallas int8 dot (Mosaic)")
    from jax.experimental import pallas as pl

    M = N = 1024
    K = 512

    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    a8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)

    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))
    try:
        out = jax.jit(f)(a8, b8)
        ref = jax.lax.dot_general(
            a8.astype(jnp.int32), b8.astype(jnp.int32),
            (((1,), (0,)), ((), ())))
        ok = bool(jnp.all(out == ref))
        print(f"pallas int8 dot compiles+correct: {ok}")
        fl = 2.0 * M * N * K
        bench("pallas int8 1024x512x1024", f, a8, b8, flops=fl)
        abf = jax.random.normal(key, (M, K), jnp.bfloat16)
        bbf = jax.random.normal(key, (K, N), jnp.bfloat16)

        def kernb(a_ref, b_ref, o_ref):
            o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32)
        fb = pl.pallas_call(
            kernb, out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32))
        bench("pallas bf16 1024x512x1024", fb, abf, bbf, flops=fl)
    except Exception as e:
        print(f"pallas int8 FAILED: {type(e).__name__}: {e}")


def main():
    key = jax.random.PRNGKey(0)
    print(f"# device: {jax.devices()[0]} (slope-timed)")
    which = set(sys.argv[1:]) or {"peak", "qkt", "conv", "pallas"}
    if "peak" in which:
        part_peak(key)
    if "qkt" in which:
        part_qkt(key)
    if "conv" in which:
        part_conv(key)
    if "pallas" in which:
        part_pallas(key)


if __name__ == "__main__":
    main()
