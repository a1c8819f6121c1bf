#!/usr/bin/env python
"""HBM bandwidth + memory-bound-op probe with a chain-clean harness.

The fori-loop harness used elsewhere folds mean(out) into the carry — an
extra full read per iteration that materially inflates memory-bound ops.
Here shape-preserving ops chain output->input directly (no extra traffic,
no DCE possible), giving true per-op cost.

Usage: python scripts/bw_probe.py
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


def bench_chain(name, fn, x, iters=20, n=4, traffic=None):
    """fn: shape/dtype-preserving; chained as c = fn(c)."""
    def looped(c):
        return jax.lax.fori_loop(0, iters, lambda _, cc: fn(cc), c)

    fj = jax.jit(looped)
    jax.device_get(jnp.ravel(fj(x))[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(jnp.ravel(fj(x))[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / iters
    bw = f"  {traffic / (ms / 1e3) / 1e9:6.1f} GB/s" if traffic else ""
    print(f"{name:52s} {ms:8.3f} ms{bw}", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    print(f"# device: {jax.devices()[0]}")

    # pure elementwise: read N + write N
    for mb, dt in ((512, jnp.float32), (512, jnp.bfloat16), (2048, jnp.bfloat16)):
        n_el = mb * 1024 * 1024 // jnp.dtype(dt).itemsize
        x = jax.random.normal(key, (n_el,), dt)
        bench_chain(f"x*1.0000001 ({mb} MB {jnp.dtype(dt).name})",
                    lambda c: c * 1.0000001, x,
                    traffic=2 * n_el * jnp.dtype(dt).itemsize)

    # transpose at the temporal-fold shape
    B, T, H, W, C = 2, 17, 64, 96, 320
    xv = jax.random.normal(key, (B, T, H, W, C), jnp.bfloat16)
    nbytes = xv.size * 2

    def roundtrip(c):
        t = c.transpose(0, 2, 3, 1, 4)
        return t.transpose(0, 3, 1, 2, 4) * 1.0000001

    bench_chain("temporal fold transpose roundtrip (134 MB)", roundtrip, xv,
                traffic=4 * nbytes)

    # norms at l0 shapes, chain-clean
    import flax.linen as nn
    xt = jax.random.normal(key, (34, 6144, 320), jnp.bfloat16)
    ln = nn.LayerNorm(dtype=jnp.bfloat16)
    pln = ln.init(key, xt)
    bench_chain("LayerNorm (34,6144,320) chain-clean",
                lambda c: ln.apply(pln, c), xt, traffic=2 * xt.size * 2)
    xs = jax.random.normal(key, (34, 64, 96, 320), jnp.bfloat16)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.bfloat16)
    pgn = gn.init(key, xs)
    bench_chain("GroupNorm32+SiLU (34,64,96,320) chain-clean",
                lambda c: jax.nn.silu(gn.apply(pgn, c)), xs,
                traffic=2 * xs.size * 2)

    # softmax rows, chain-clean (fp32)
    xm = jax.random.normal(key, (8192, 8192), jnp.float32)
    bench_chain("softmax (8192,8192) fp32 chain-clean",
                lambda c: jax.nn.softmax(c, axis=-1), xm,
                traffic=2 * xm.size * 4)


if __name__ == "__main__":
    main()
