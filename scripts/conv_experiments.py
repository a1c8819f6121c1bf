#!/usr/bin/env python
"""Conv3x3 efficiency experiments (VERDICT r2 Next #5).

The headline conv3x3 320->320 at (34,64,96) runs at ~40% MXU efficiency and
the VAE decoder's full-res convs dominate its 545 ms.  Try, in order:
  1. baseline lax.conv (NHWC, preferred fp32 accum)
  2. accumulate in bf16 (preferred_element_type=bf16)
  3. explicit im2col -> one big matmul (M=N*H*W, K=9*Cin, N=Cout)
  4. 9-tap shifted-matmul decomposition (what XLA may already do)
  5. channel padding 320->384 (full 128-lane tiles, 1.2x more flops)
  6. XLA flag variants are driven from the shell (see PERF_r3.md)

Also benches the VAE-decoder conv shapes (the ones behind VERDICT #4).

Usage: python scripts/conv_experiments.py
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


def conv_variants(B, H, W, Cin, Cout, tag=""):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16)
    flops = 2.0 * B * H * W * Cin * Cout * 9

    def conv(x, w, pref=jnp.float32):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref).astype(jnp.bfloat16)

    bench(f"{tag}conv lax fp32acc", lambda x, w: conv(x, w), x, w, flops=flops)
    bench(f"{tag}conv lax bf16acc",
          lambda x, w: conv(x, w, jnp.bfloat16), x, w, flops=flops)

    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)  # (B,H,W,9*Cin)
        return jnp.einsum("bhwk,ko->bhwo", patches,
                          w.transpose(0, 1, 2, 3).reshape(9 * Cin, Cout),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    bench(f"{tag}conv im2col matmul", im2col, x, w, flops=flops)

    def taps(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = jnp.einsum("bhwc,co->bhwo", xp[:, dy:dy + H, dx:dx + W, :],
                               w[dy, dx], preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return acc.astype(jnp.bfloat16)

    bench(f"{tag}conv 9-tap matmuls", taps, x, w, flops=flops)

    if Cin % 128 or Cout % 128:
        cin_p = (Cin + 127) // 128 * 128
        cout_p = (Cout + 127) // 128 * 128
        xpd = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - Cin)))
        wpd = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - Cin),
                          (0, cout_p - Cout)))
        bench(f"{tag}conv padded {cin_p}->{cout_p}",
              lambda x, w: conv(x, w)[..., :Cout], xpd, wpd, flops=flops)


def main():
    print(f"# device: {jax.devices()[0]}")
    print("# UNet level-0 conv (34,64,96) 320->320")
    conv_variants(34, 64, 96, 320, 320)
    print("# VAE decoder convs (17 frames)")
    conv_variants(17, 512, 768, 128, 128, tag="vae-l0 ")
    conv_variants(17, 256, 384, 256, 256, tag="vae-l1 ")
    conv_variants(17, 128, 192, 512, 512, tag="vae-l2 ")


if __name__ == "__main__":
    main()
