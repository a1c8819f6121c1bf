#!/usr/bin/env python
"""Round-3b forensics: (a) VAE decoder per-level cost + exact FLOP roofline,
(b) ControlNet hint-pyramid cost (loop-invariant hoisting candidate).

Slope-timed (see profile_r3.py): per-op ms = (T(i2)-T(i1))/(i2-i1), immune to
the ~30 ms fixed per-execution cost of the axon tunnel.

Usage: python scripts/profile_vae_hint.py [vae|hint|levels]
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


def bench(name, fn, *args, i1=2, i2=6, n=3, flops=None):
    def make(iters):
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
    gf = f"  {flops/1e9:8.0f} GF" if flops else ""
    print(f"{name:48s} {ms:9.2f} ms{gf}{eff}", flush=True)
    return ms


def conv_flops(cin, cout, h, w, n, k=3):
    return 2.0 * k * k * cin * cout * h * w * n


def decoder_flop_budget(T=17, h=64, w=96):
    """Exact conv+attn FLOPs of the SD f8 decoder at (T, h, w, 4) latents."""
    total = 0.0
    total += conv_flops(4, 4, h, w, T, k=1)          # post_quant
    total += conv_flops(4, 512, h, w, T)             # conv_in
    # mid: 2 resblocks (2 convs each) + attn
    total += 4 * conv_flops(512, 512, h, w, T)
    total += 4.0 * T * (h * w) ** 2 * 512 + 4 * conv_flops(512, 512, h, w, T, k=1)  # attn qkvo 1x1 + sdpa
    res = [(3, 512, 512, h, w), (3, 512, 512, 2 * h, 2 * w),
           (3, 512, 256, 4 * h, 4 * w), (3, 256, 128, 8 * h, 8 * w)]
    hh, ww, cur = h, w, 512
    for level, (nb, cin, cout, hh, ww) in enumerate(res):
        for i in range(nb):
            ci = cin if i == 0 else cout
            total += 2 * conv_flops(cout, cout, hh, ww, T) if ci == cout else (
                conv_flops(ci, cout, hh, ww, T) + conv_flops(cout, cout, hh, ww, T)
                + conv_flops(ci, cout, hh, ww, T, k=1))
        if level != 3:
            total += conv_flops(cout, cout, hh * 2, ww * 2, T)  # upsample conv
    total += conv_flops(128, 3, 8 * h, 8 * w, T)     # conv_out
    return total


def vae_total(key, dtype):
    from ccedit_tpu.modules.vae import AutoencoderKL

    vae = AutoencoderKL(dtype=dtype)
    z = jnp.zeros((17, 64, 96, 4), jnp.float32)
    v_shapes = jax.eval_shape(
        lambda k, zz: vae.init(k, zz, method=AutoencoderKL.decode), key, z)
    vp = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        v_shapes)
    fl = decoder_flop_budget()
    print(f"# exact decoder FLOPs (17f 512x768): {fl/1e12:.2f} TFLOP; "
          f"100%-MXU floor {fl/PEAK*1e3:.0f} ms; at 60% {fl/PEAK/0.6*1e3:.0f} ms")
    bench("VAE decode 17f 512x768 (whole)",
          lambda zz, p: vae.apply(p, zz, method=AutoencoderKL.decode),
          z, vp, i1=1, i2=4, n=3, flops=fl)


def vae_levels(key, dtype):
    """Each decoder stage in isolation at its true shape."""
    import flax.linen as nn
    from ccedit_tpu.modules.vae import VAEAttnBlock, VAEResnetBlock, VAEUpsample

    T = 17

    def run(name, mod, shape, flops=None, **kw):
        x = jax.random.normal(key, shape, dtype)
        p = mod.init(key, x)
        p = jax.tree_util.tree_map(
            lambda s: s.astype(dtype) if s.dtype == jnp.float32 else s, p)
        bench(name, lambda xx, pp: mod.apply(pp, xx), x, p, flops=flops, **kw)

    h, w = 64, 96
    run("mid resblock 512 @64x96", VAEResnetBlock(512, 512, dtype=dtype),
        (T, h, w, 512), flops=4 * conv_flops(512, 512, h, w, T) / 2)
    run("mid attn 512 @6144tok", VAEAttnBlock(512, dtype=dtype),
        (T, h, w, 512),
        flops=4.0 * T * (h * w) ** 2 * 512 + 4 * conv_flops(512, 512, h, w, T, k=1))
    run("l3 resblock 512 @64x96", VAEResnetBlock(512, 512, dtype=dtype),
        (T, h, w, 512), flops=2 * conv_flops(512, 512, h, w, T))
    run("l3 upsample 512 ->128x192", VAEUpsample(512, dtype=dtype),
        (T, h, w, 512), flops=conv_flops(512, 512, 2 * h, 2 * w, T))
    run("l2 resblock 512 @128x192", VAEResnetBlock(512, 512, dtype=dtype),
        (T, 2 * h, 2 * w, 512), flops=2 * conv_flops(512, 512, 2 * h, 2 * w, T))
    run("l2 upsample 512 ->256x384", VAEUpsample(512, dtype=dtype),
        (T, 2 * h, 2 * w, 512), flops=conv_flops(512, 512, 4 * h, 4 * w, T))
    run("l1 resblock 512->256 @256x384",
        VAEResnetBlock(512, 256, dtype=dtype), (T, 4 * h, 4 * w, 512),
        flops=conv_flops(512, 256, 4 * h, 4 * w, T)
        + conv_flops(256, 256, 4 * h, 4 * w, T)
        + conv_flops(512, 256, 4 * h, 4 * w, T, k=1))
    run("l1 resblock 256 @256x384", VAEResnetBlock(256, 256, dtype=dtype),
        (T, 4 * h, 4 * w, 256), flops=2 * conv_flops(256, 256, 4 * h, 4 * w, T))
    run("l1 upsample 256 ->512x768", VAEUpsample(256, dtype=dtype),
        (T, 4 * h, 4 * w, 256), flops=conv_flops(256, 256, 8 * h, 8 * w, T))
    run("l0 resblock 256->128 @512x768",
        VAEResnetBlock(256, 128, dtype=dtype), (T, 8 * h, 8 * w, 256),
        flops=conv_flops(256, 128, 8 * h, 8 * w, T)
        + conv_flops(128, 128, 8 * h, 8 * w, T)
        + conv_flops(256, 128, 8 * h, 8 * w, T, k=1), i1=1, i2=4)
    run("l0 resblock 128 @512x768", VAEResnetBlock(128, 128, dtype=dtype),
        (T, 8 * h, 8 * w, 128), flops=2 * conv_flops(128, 128, 8 * h, 8 * w, T),
        i1=1, i2=4)
    # final norm+silu+conv_out
    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype)(x)
            return nn.Conv(3, (3, 3), padding="SAME", dtype=dtype)(nn.silu(x))
    run("tail norm+conv_out @512x768", Tail(), (T, 8 * h, 8 * w, 128),
        flops=conv_flops(128, 3, 8 * h, 8 * w, T), i1=1, i2=4)


def hint_part(key, dtype):
    from ccedit_tpu.modules.controlnet import HintPyramid

    hp = HintPyramid(320, dtype=dtype)
    hint = jax.random.normal(key, (34, 512, 768, 3), dtype)  # CFG-doubled 17f
    p = hp.init(key, hint)
    p = jax.tree_util.tree_map(
        lambda s: s.astype(dtype) if s.dtype == jnp.float32 else s, p)
    bench("HintPyramid (34,512,768,3)->latent", lambda x, pp: hp.apply(pp, x),
          hint, p, i1=2, i2=8)


def main():
    which = set(sys.argv[1:]) or {"vae", "hint", "levels"}
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    print(f"# device: {jax.devices()[0]} (slope-timed)")
    if "hint" in which:
        hint_part(key, dtype)
    if "vae" in which:
        vae_total(key, dtype)
    if "levels" in which:
        vae_levels(key, dtype)


if __name__ == "__main__":
    main()
