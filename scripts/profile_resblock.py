#!/usr/bin/env python
"""ResBlock3D component profile (round-3) — hunting slow temporal twins.

The temporal 1D conv (k=3 over T=17) and its GroupNorm run on (B*H*W, T, C)
tensors whose tiny T minor pads badly — the same layout family that made
temporal attention run at 1% of roofline in round 2.  Prices each piece and
a shifted-matmul reformulation of the 1D conv.

Usage: python scripts/profile_resblock.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PEAK = 197e12


def bench(name, fn, *args, iters=20, n=4, flops=None):
    def looped(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            return carry + (1e-12 * jnp.mean(out)).astype(carry.dtype)
        return jax.lax.fori_loop(0, iters, body, a[0])

    fj = jax.jit(looped)
    jax.device_get(jnp.ravel(fj(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(jnp.ravel(fj(*args))[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / iters
    eff = f"  eff={flops / PEAK / (ms / 1e3) * 100:5.1f}%" if flops else ""
    print(f"{name:52s} {ms:8.2f} ms{eff}", flush=True)
    return ms


def main():
    import flax.linen as nn

    from ccedit_tpu.modules.blocks import ResBlock3D, TemporalConv

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    B, T, H, W, C = 2, 17, 64, 96, 320
    BHW = B * H * W  # 12288

    print(f"# device: {jax.devices()[0]}")

    # whole block at l0
    rb = ResBlock3D(channels=C, emb_channels=1280, dtype=dtype)
    xv = jax.random.normal(key, (B, T, H, W, C), dtype)
    emb = jax.random.normal(key, (B, 1280), dtype)
    prb = rb.init(key, xv, emb)
    bench("ResBlock3D whole (l0)", lambda x, p, e: rb.apply(p, x, e),
          xv, prb, emb, iters=10)

    # temporal conv1d as shipped
    tc = TemporalConv(C, 3, dtype=dtype)
    xt = jax.random.normal(key, (BHW, T, C), dtype)
    ptc = tc.init(key, xt)
    tc_flops = 2.0 * BHW * T * 3 * C * C
    bench("TemporalConv k=3 (12288,17,320) [nn.Conv]",
          lambda x, p: tc.apply(p, x), xt, ptc, flops=tc_flops)

    # shifted-matmul reformulation
    w3 = jax.random.normal(key, (3, C, C), dtype) * 0.02
    b3 = jnp.zeros((C,), dtype)

    def shifted(x, w, b):
        # out[t] = x[t-1]@w0 + x[t]@w1 + x[t+1]@w2   (SAME padding)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        acc = None
        for dt in range(3):
            t_ = jnp.einsum("ntc,co->nto", xp[:, dt:dt + T, :], w[dt],
                            preferred_element_type=jnp.float32)
            acc = t_ if acc is None else acc + t_
        return (acc + b.astype(jnp.float32)).astype(x.dtype)

    bench("TemporalConv as 3 shifted matmuls",
          lambda x, w, b: shifted(x, w, b), xt, w3, b3, flops=tc_flops)

    # fold T into the lead axis first (single matmul view on (BHW*T, C))
    def shifted_flat(x, w, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate([xp[:, dt:dt + T, :] for dt in range(3)],
                               axis=-1)  # (BHW, T, 3C)
        out = jnp.einsum("ntk,ko->nto", cols, w.reshape(3 * C, C),
                         preferred_element_type=jnp.float32)
        return (out + b.astype(jnp.float32)).astype(x.dtype)

    bench("TemporalConv as im2col matmul",
          lambda x, w, b: shifted_flat(x, w, b), xt, w3, b3, flops=tc_flops)

    # temporal groupnorm as shipped (on (BHW, T, C))
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype)
    pgn = gn.init(key, xt)
    bench("temporal GroupNorm32 (12288,17,320)",
          lambda x, p: jax.nn.silu(gn.apply(p, x)), xt, pgn)

    # spatial conv for comparison
    xs = jax.random.normal(key, (B * T, H, W, C), dtype)
    conv = nn.Conv(C, (3, 3), padding="SAME", dtype=dtype)
    pc = conv.init(key, xs)
    bench("spatial conv3x3 (34,64,96,320)",
          lambda x, p: conv.apply(p, x), xs, pc,
          flops=2.0 * B * T * H * W * C * C * 9)

    # timestep-embedding dense (per-block)
    emb_l = nn.Dense(C, dtype=dtype)
    pe = emb_l.init(key, emb)
    bench("emb Dense 1280->320 (b2)", lambda e, p: emb_l.apply(p, e), emb, pe)


if __name__ == "__main__":
    main()
