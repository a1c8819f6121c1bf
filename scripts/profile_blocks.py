#!/usr/bin/env python
"""Per-block timings at headline shapes + flash-attention block sweep."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cc"))

def sync(r): jax.device_get(jnp.ravel(r)[0])

def bench(name, fn, *args, iters=20, n=4):
    def looped(*a):
        def body(_, c):
            o = fn(c, *a[1:])
            leaves = jax.tree_util.tree_leaves(o)
            return c + (1e-9*jnp.mean(leaves[0])).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, a[0])
    fj = jax.jit(looped); sync(fj(*args))
    ts = []
    for _ in range(n):
        t0=time.perf_counter(); sync(fj(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:46s} {min(ts)*1e3/iters:8.2f} ms", flush=True)

which = set(sys.argv[1:]) or {"sweep"}
key = jax.random.PRNGKey(0)

if "sweep" in which:
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    b, h, nq, d = 34, 8, 6144, 40
    q = jax.random.normal(key, (b, h, nq, d), jnp.bfloat16)
    for (bq, bkm, bk) in [(1024, 2048, 1024), (2048, 2048, 1024), (2048, 6144, 2048),
                          (1024, 6144, 1024), (512, 2048, 512), (2048, 3072, 1536),
                          (6144, 6144, 2048), (1024, 1024, 1024)]:
        try:
            bs = fa.BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)
            bench(f"flash 6144x40 bq{bq} bkm{bkm} bk{bk}",
                  lambda q, bs=bs: fa.flash_attention(q, q, q, causal=False,
                                                      sm_scale=0.158, block_sizes=bs), q)
        except Exception as e:
            print(f"bq{bq} bkm{bkm} bk{bk}: {type(e).__name__} {str(e)[:80]}", flush=True)

if "blocks" in which:
    from ccedit_tpu.modules.blocks import ResBlock3D
    from ccedit_tpu.modules.transformer import SpatialTransformer3D
    B, T, H, W, C = 2, 17, 64, 96, 320
    x = jax.random.normal(key, (B, T, H, W, C), jnp.bfloat16)
    emb = jax.random.normal(key, (B, 1280), jnp.bfloat16)
    rb = ResBlock3D(channels=C, emb_channels=1280, dtype=jnp.bfloat16)
    p = jax.eval_shape(rb.init, key, x, emb)
    p = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), p)
    bench("ResBlock3D l0 (2,17,64,96,320)", lambda x, p: rb.apply(p, x, emb), x, p)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    st = SpatialTransformer3D(in_channels=C, n_heads=8, d_head=40, depth=1,
                              context_dim=768, dtype=jnp.bfloat16)
    ps = jax.eval_shape(st.init, key, x, ctx)
    ps = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), ps)
    bench("SpatialTransformer3D l0", lambda x, ps: st.apply(ps, x, ctx), x, ps)
