#!/usr/bin/env python
"""Probe: eliminate the tokens_to_temporal / temporal_to_tokens transposes
around the temporal branch of ResBlock3D (PERF_r3 §6: whole-block 18.2 ms vs
parts-sum ~16 — the glue is hypothesized to be the 2 full-activation
transposes per spatial_temporal call).

Variant A (shipped): (BT,H,W,C) -> transpose -> (BHW,T,C) -> GN+SiLU+conv1d
over T -> transpose back.
Variant B (probe): keep (B,T,H,W,C); GN stats reduced in place over
(T, C-group) per (b,h,w); SiLU; conv over T with kernel (k,1,1).

Numerics must match (same reduction semantics); timing via slope
(chained fori_loop at two trip counts).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ccedit_tpu.ops.video import tokens_to_temporal, temporal_to_tokens

B, T, H, W, C = 2, 17, 64, 96, 320
G = 32
K = 3
dtype = jnp.bfloat16


def sync(x):
    jax.block_until_ready(x)
    jax.device_get(jnp.ravel(x)[0])
    return x


def slope_time(fn, *args):
    """Chained-eval slope between n=2 and n=6 (immune to fixed dispatch)."""
    f2 = jax.jit(partial(fn, n=2))
    f6 = jax.jit(partial(fn, n=6))
    sync(f2(*args)); sync(f6(*args))
    t0 = time.time(); sync(f2(*args)); t2 = time.time() - t0
    t0 = time.time(); sync(f6(*args)); t6 = time.time() - t0
    return (t6 - t2) / 4 * 1000


def gn_rows(x, gamma, beta):
    """GN over (T, C/G) per row — the shipped semantics on (rows, T, C)."""
    r, t, c = x.shape
    xg = x.reshape(r, t, G, c // G).astype(jnp.float32)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xn = ((xg - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(r, t, c)
    return (xn * gamma + beta).astype(x.dtype)


def gn_inplace(x, gamma, beta):
    """Same stats, BTHWC layout: reduce over (T, C/G) per (b,h,w)."""
    b, t, h, w, c = x.shape
    xg = x.reshape(b, t, h, w, G, c // G).astype(jnp.float32)
    mu = xg.mean(axis=(1, 5), keepdims=True)
    var = xg.var(axis=(1, 5), keepdims=True)
    xn = ((xg - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(b, t, h, w, c)
    return (xn * gamma + beta).astype(x.dtype)


def conv1d_t(x, w_):
    """(rows, T, C) conv over T, SAME."""
    return jax.lax.conv_general_dilated(
        x, w_, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))


def conv_t_inplace(x, w_):
    """(B,T,H,W,C) conv over T only, kernel (K,1,1)."""
    return jax.lax.conv_general_dilated(
        x, w_[:, None, None], (1, 1, 1), [( (K - 1) // 2, (K - 1) // 2), (0, 0), (0, 0)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, H, W, C), dtype)
    gamma = jax.random.normal(jax.random.PRNGKey(1), (C,), jnp.float32)
    beta = jax.random.normal(jax.random.PRNGKey(2), (C,), jnp.float32)
    wt = (jax.random.normal(jax.random.PRNGKey(3), (K, C, C), jnp.float32) * 0.02).astype(dtype)

    # ---- numerics parity ----
    xs = x.reshape(B * T, H, W, C)
    xt = tokens_to_temporal(xs, B)
    ya = conv1d_t(jax.nn.silu(gn_rows(xt, gamma, beta)), wt)
    ya = temporal_to_tokens(xt + ya, B, H, W).reshape(B, T, H, W, C)

    yb = x + conv_t_inplace(jax.nn.silu(gn_inplace(x, gamma, beta)), wt)
    err = jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
    rel = err / jnp.max(jnp.abs(ya.astype(jnp.float32)))
    print(f"parity: max abs err {float(err):.3e}  rel {float(rel):.3e}")

    # ---- timing ----
    def variant_a(x, gamma, beta, wt, n):
        def body(i, acc):
            xs = (acc).reshape(B * T, H, W, C)
            xt = tokens_to_temporal(xs, B)
            y = conv1d_t(jax.nn.silu(gn_rows(xt, gamma, beta)), wt)
            out = temporal_to_tokens(xt + y, B, H, W)
            return out.reshape(B, T, H, W, C) * 0.5
        return jax.lax.fori_loop(0, n, body, x)

    def variant_b(x, gamma, beta, wt, n):
        def body(i, acc):
            y = conv_t_inplace(jax.nn.silu(gn_inplace(acc, gamma, beta)), wt)
            return (acc + y) * 0.5
        return jax.lax.fori_loop(0, n, body, x)

    def transpose_only(x, n):
        def body(i, acc):
            xs = acc.reshape(B * T, H, W, C)
            xt = tokens_to_temporal(xs, B)
            out = temporal_to_tokens(xt, B, H, W)
            return out.reshape(B, T, H, W, C) * 0.5
        return jax.lax.fori_loop(0, n, body, x)

    ms_a = slope_time(variant_a, x, gamma, beta, wt)
    ms_b = slope_time(variant_b, x, gamma, beta, wt)
    ms_t = slope_time(transpose_only, x)
    print(f"temporal branch (GN+SiLU+conv+add) @ {(B,T,H,W,C)}:")
    print(f"  A transposed rows : {ms_a:.2f} ms")
    print(f"  B in-place BTHWC  : {ms_b:.2f} ms")
    print(f"  transpose pair alone: {ms_t:.2f} ms")

    # also at l1 (32x48, 640ch) and l2 (16x24, 1280ch)
    for (h2, w2, c2) in [(32, 48, 640), (16, 24, 1280)]:
        x2 = jax.random.normal(key, (B, T, h2, w2, c2), dtype)
        g2 = jnp.ones((c2,), jnp.float32); b2 = jnp.zeros((c2,), jnp.float32)
        w2_ = (jax.random.normal(key, (K, c2, c2), jnp.float32) * 0.02).astype(dtype)

        def va(x, g, bb, w_, n, hh=h2, ww=w2, cc=c2):
            def body(i, acc):
                xs = acc.reshape(B * T, hh, ww, cc)
                xt = tokens_to_temporal(xs, B)
                y = conv1d_t(jax.nn.silu(gn_rows(xt, g, bb)), w_)
                out = temporal_to_tokens(xt + y, B, hh, ww)
                return out.reshape(B, T, hh, ww, cc) * 0.5
            return jax.lax.fori_loop(0, n, body, x)

        def vb(x, g, bb, w_, n):
            def body(i, acc):
                y = conv_t_inplace(jax.nn.silu(gn_inplace(acc, g, bb)), w_)
                return (acc + y) * 0.5
            return jax.lax.fori_loop(0, n, body, x)

        print(f"  l @ {(h2, w2, c2)}: A {slope_time(va, x2, g2, b2, w2_):.2f} ms"
              f"  B {slope_time(vb, x2, g2, b2, w2_):.2f} ms")


if __name__ == "__main__":
    main()
