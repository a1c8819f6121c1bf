#!/usr/bin/env python
"""Round-3 corrected per-op profile — SLOPE timing.

Round-2/early-round-3 microbenches divided (fixed ~30 ms per-execution cost
+ iters x true) by iters at iters=3..20, inflating every small op by 1.5-10
ms.  Here each op is timed at two iteration counts and the cost is the
SLOPE (T2-T1)/(i2-i1) — immune to any fixed per-execution cost.

Usage: python scripts/profile_r3.py [attn|net|vae|glue|conv]
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


def bench(name, fn, *args, i1=5, i2=25, n=3, flops=None, chain=False):
    """Slope-timed: per-op ms = (T(i2) - T(i1)) / (i2 - i1)."""
    def make(iters):
        if chain:  # shape-preserving op chained directly
            def looped(*a):
                return jax.lax.fori_loop(
                    0, iters, lambda _, c: fn(c, *a[1:]), a[0])
        else:
            def looped(*a):
                def body(_, carry):
                    out = fn(carry, *a[1:])
                    return carry + (1e-12 * jnp.mean(out)).astype(carry.dtype)
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
    eff = f"  eff={flops / PEAK / (ms / 1e3) * 100:5.1f}%" if flops else ""
    print(f"{name:52s} {ms:8.2f} ms{eff}", flush=True)
    return ms


def attn_part(key, dtype):
    from ccedit_tpu.ops.attention import dot_product_attention
    for (b, h, nq, d) in [(34, 8, 6144, 40), (34, 8, 1536, 80),
                          (34, 8, 384, 160)]:
        q = jax.random.normal(key, (b, h, nq, d), dtype)
        bench(f"spatial attn ({b},{h},{nq},{d})",
              lambda q: dot_product_attention(q, q, q), q,
              flops=4.0 * b * h * nq * nq * d)
    q = jax.random.normal(key, (12288, 8, 32, 40), dtype)
    bench("temporal attn pallas (12288,8,32,40)",
          lambda q: dot_product_attention(q, q, q), q)
    q = jax.random.normal(key, (34, 8, 6144, 40), dtype)
    kv = jax.random.normal(key, (34, 8, 77, 40), dtype)
    bench("text cross-attn SDPA (6144q x 77kv)",
          lambda q, kv: dot_product_attention(q, kv, kv), q, kv)


def glue_part(key, dtype):
    import flax.linen as nn
    from ccedit_tpu.modules.transformer import FeedForward

    xt = jax.random.normal(key, (34, 6144, 320), dtype)
    ff = FeedForward(320, dtype=dtype)
    pff = ff.init(key, xt)
    bench("GEGLU FF l0", lambda x, p: ff.apply(p, x), xt, pff,
          flops=2.0 * 34 * 6144 * (320 * 320 * 8 + 320 * 4 * 320))
    ln = nn.LayerNorm(dtype=dtype)
    pln = ln.init(key, xt)
    bench("LayerNorm l0", lambda c, p: ln.apply(p, c), xt, pln, chain=True)
    xs = jax.random.normal(key, (34, 64, 96, 320), dtype)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype)
    pgn = gn.init(key, xs)
    bench("GroupNorm32+SiLU l0",
          lambda c, p: jax.nn.silu(gn.apply(p, c)), xs, pgn, chain=True)


def conv_part(key, dtype):
    import flax.linen as nn
    from ccedit_tpu.modules.blocks import ResBlock3D, TemporalConv

    xs = jax.random.normal(key, (34, 64, 96, 320), dtype)
    conv = nn.Conv(320, (3, 3), padding="SAME", dtype=dtype)
    pc = conv.init(key, xs)
    bench("spatial conv3x3 l0 (34,64,96,320)",
          lambda c, p: conv.apply(p, c), xs, pc, chain=True,
          flops=2.0 * 34 * 64 * 96 * 320 * 320 * 9)
    xt = jax.random.normal(key, (12288, 17, 320), dtype)
    tc = TemporalConv(320, 3, dtype=dtype)
    ptc = tc.init(key, xt)
    bench("temporal conv k=3 (12288,17,320)",
          lambda c, p: tc.apply(p, c), xt, ptc, chain=True,
          flops=2.0 * 12288 * 17 * 3 * 320 * 320)
    rb = ResBlock3D(channels=320, emb_channels=1280, dtype=dtype)
    xv = jax.random.normal(key, (2, 17, 64, 96, 320), dtype)
    emb = jax.random.normal(key, (2, 1280), dtype)
    prb = rb.init(key, xv, emb)
    bench("ResBlock3D whole l0",
          lambda c, p, e: rb.apply(p, c, e), xv, prb, emb, chain=True)
    # VAE decoder convs
    for (n, hh, ww, c) in [(17, 512, 768, 128), (17, 256, 384, 256),
                           (17, 128, 192, 512)]:
        x = jax.random.normal(key, (n, hh, ww, c), dtype)
        cv = nn.Conv(c, (3, 3), padding="SAME", dtype=dtype)
        p = cv.init(key, x)
        bench(f"vae conv3x3 ({n},{hh},{ww},{c})",
              lambda cc, p: cv.apply(p, cc), x, p, chain=True, i1=3, i2=9,
              flops=2.0 * n * hh * ww * c * c * 9)


def net_part(key, dtype):
    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    T, H, W = 17, 512, 768
    sd15 = dict(in_channels=4, model_channels=320, out_channels=4,
                num_res_blocks=2, attention_resolutions=(4, 2, 1),
                channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                context_dim=768, dtype=dtype)
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                     **sd15)
    cn = ControlNet2D(hint_channels=3, **sd15)
    net = CCEditNetwork(unet=unet, controlnet=cn)
    x = jnp.zeros((2, T, H // 8, W // 8, 4), jnp.float32)
    tt = jnp.array([500.0, 500.0])
    cond = {"crossattn": jnp.zeros((2, 77, 768), dtype),
            "control_hint": jnp.zeros((2, T, H, W, 3), dtype)}
    p_shapes = jax.eval_shape(net.init, key, x, tt, cond)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        p_shapes)
    bench("full NFE (UNet+CN, CFG batch)",
          lambda c, p, cc: net.apply(p, c, tt, cc), x, params, cond,
          chain=False, i1=2, i2=6, n=2)
    bench("UNet alone", lambda c, p, cc: unet.apply(
        {"params": p["params"]["unet"]}, c, tt, cc["crossattn"]),
        x, params, cond, chain=False, i1=2, i2=6, n=2)


def vae_part(key, dtype):
    from ccedit_tpu.modules.vae import AutoencoderKL

    vae = AutoencoderKL(dtype=dtype)
    z = jnp.zeros((17, 64, 96, 4), jnp.float32)
    v_shapes = jax.eval_shape(
        lambda k, zz: vae.init(k, zz, method=AutoencoderKL.decode), key, z)
    vp = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        v_shapes)
    bench("VAE decode 17f 512x768",
          lambda zz, p: vae.apply(p, zz, method=AutoencoderKL.decode),
          z, vp, i1=2, i2=6, n=2)


def main():
    which = set(sys.argv[1:]) or {"attn", "glue", "conv"}
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    print(f"# device: {jax.devices()[0]} (slope-timed)")
    if "attn" in which:
        attn_part(key, dtype)
    if "glue" in which:
        glue_part(key, dtype)
    if "conv" in which:
        conv_part(key, dtype)
    if "net" in which:
        net_part(key, dtype)
    if "vae" in which:
        vae_part(key, dtype)


if __name__ == "__main__":
    main()
