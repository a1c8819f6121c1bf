#!/usr/bin/env python
"""Transformer 'glue' profile at the l0 headline shape (round-3).

NFE = 946 ms; spatial flash accounts for ~340 ms, ResBlocks ~250 ms.  This
script prices everything else in the SpatialTransformer3D: cross-attn to 77
text tokens, GEGLU FF, proj in/out, norms, temporal fold transposes — to
find any round-2-temporal-attention-style pathology hiding in the residue.

Usage: python scripts/profile_glue.py
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
    print(f"{name:48s} {ms:8.2f} ms{eff}", flush=True)
    return ms


def main():
    import flax.linen as nn

    from ccedit_tpu.modules.transformer import (
        BasicTransformerBlock, CrossAttention, FeedForward, SpatialTransformer3D,
    )

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    B, T, H, W, C = 2, 17, 64, 96, 320
    NT = B * T           # 34 folded frames
    L = H * W            # 6144 tokens
    heads, dh = 8, 40

    print(f"# device: {jax.devices()[0]}")

    x_tok = jax.random.normal(key, (NT, L, C), dtype)
    ctx = jax.random.normal(key, (NT, 77, 768), dtype)

    # --- cross-attention to 77 text tokens (XLA path) ---------------------
    ca = CrossAttention(C, heads=heads, dim_head=dh, context_dim=768,
                        dtype=dtype)
    pca = ca.init(key, x_tok, context=ctx)
    bench("cross-attn 6144q x 77kv (l0)",
          lambda x, p, c: ca.apply(p, x, context=c), x_tok, pca, ctx,
          flops=4.0 * NT * heads * L * 77 * dh
          + 2.0 * NT * L * C * C * 2 + 2.0 * NT * 77 * 768 * C * 2)

    # --- self-attention wrapper (flash + qkv/proj matmuls) ----------------
    sa = CrossAttention(C, heads=heads, dim_head=dh, dtype=dtype)
    psa = sa.init(key, x_tok)
    bench("self-attn whole (qkv+flash+proj, l0)",
          lambda x, p: sa.apply(p, x), x_tok, psa,
          flops=4.0 * NT * heads * L * L * dh + 2.0 * NT * L * C * C * 4)

    # --- GEGLU feed-forward ----------------------------------------------
    ff = FeedForward(C, dtype=dtype)
    pff = ff.init(key, x_tok)
    bench("GEGLU FF 320->2560->320 (l0)",
          lambda x, p: ff.apply(p, x), x_tok, pff,
          flops=2.0 * NT * L * (C * C * 8 + C * 4 * C))

    # --- norms ------------------------------------------------------------
    ln = nn.LayerNorm(dtype=dtype)
    pln = ln.init(key, x_tok)
    bench("LayerNorm (34,6144,320)", lambda x, p: ln.apply(p, x), x_tok, pln)

    x_sp = jax.random.normal(key, (NT, H, W, C), dtype)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype)
    pgn = gn.init(key, x_sp)
    bench("GroupNorm32 (34,64,96,320)", lambda x, p: gn.apply(p, x), x_sp, pgn)

    # --- temporal fold transposes ----------------------------------------
    xv = jax.random.normal(key, (B, T, H, W, C), dtype)
    bench("fold (b t h w c)->(b h w) t c  [transpose]",
          lambda x: x.transpose(0, 2, 3, 1, 4).reshape(B * H * W, T, C), xv)
    xt = jax.random.normal(key, (B * H * W, T, C), dtype)
    bench("unfold (b h w) t c->(b t) h w c [transpose]",
          lambda x: x.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)
          .reshape(NT, H, W, C), xt)

    # --- whole blocks -----------------------------------------------------
    btb = BasicTransformerBlock(C, heads, dh, context_dim=768, dtype=dtype)
    pbtb = btb.init(key, x_tok, context=ctx)
    bench("BasicTransformerBlock whole (l0)",
          lambda x, p, c: btb.apply(p, x, context=c), x_tok, pbtb, ctx,
          iters=10)

    st3 = SpatialTransformer3D(C, heads, dh, context_dim=768, use_linear=False,
                               dtype=dtype)
    pst3 = st3.init(key, xv, context=ctx[:B])

    def st3_apply(x, p, c):
        return st3.apply(p, x, context=c)

    bench("SpatialTransformer3D whole (l0)", st3_apply, xv, pst3, ctx[:B],
          iters=10)


if __name__ == "__main__":
    main()
