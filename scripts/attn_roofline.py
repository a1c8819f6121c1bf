#!/usr/bin/env python
"""Component roofline for the d=40 spatial attention (VERDICT r2 Next #2).

The (34,8,6144,40) spatial self-attention runs at 21% MXU efficiency and two
custom kernels failed to beat stock flash (39-42 vs 40.5 ms).  Before a third
attempt, measure the hardware ceilings of each COMPONENT in isolation:

  1. QK^T matmul at K(contraction)=40 vs 48/64/128 — is the systolic-array
     K-padding ceiling real, and what is the actual [6144x6144xK] time?
  2. AV matmul at output-minor 40 vs 128 — same question for the N side.
  3. softmax VPU throughput: exp/max/sum/div over big fp32/bf16 tiles —
     elements/s, to price the 10.3e9 score elements of the full op.

If MXU(QK+AV at d-pad) + VPU(softmax) ~= 40 ms, the op is at its hardware
ceiling and the correct verdict is a written proof, not another kernel.

Usage: python scripts/attn_roofline.py
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

PEAK = 197e12  # v5e bf16 FLOP/s


def bench(name, fn, *args, iters=20, n=4, flops=None, elems=None):
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
    extra = ""
    if flops:
        extra = f"  eff={flops / PEAK / (ms / 1e3) * 100:5.1f}%"
    if elems:
        extra += f"  {elems / (ms / 1e3) / 1e9:6.1f} Gelem/s"
    print(f"{name:46s} {ms:8.2f} ms{extra}", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    B, H, N, D = 34, 8, 6144, 40
    BH = B * H  # 272

    # ---- 1. QK^T: contraction-K sweep (batched like the real op) ----------
    print("# 1. QK^T  (272 batched [6144,K]@[K,6144], bf16)")
    for Kc in (40, 48, 64, 128, 256):
        q = jax.random.normal(key, (BH, N, Kc), jnp.bfloat16)
        bench(f"qk K={Kc}",
              lambda q: jnp.einsum("bnk,bmk->bnm", q, q,
                                   preferred_element_type=jnp.float32)
              .astype(jnp.bfloat16),
              q, flops=2.0 * BH * N * N * Kc)

    # ---- 2. AV: output-minor sweep ---------------------------------------
    print("# 2. S@V  (272 batched [6144,6144]@[6144,Dv], S bf16)")
    for Dv in (40, 64, 128):
        # scores can't all fit HBM at fp32 batch 272; use batch 16 and scale
        b2 = 16
        s = jax.random.normal(key, (b2, N, N), jnp.bfloat16)
        v = jax.random.normal(key, (b2, N, Dv), jnp.bfloat16)
        bench(f"av Dv={Dv} (batch {b2})",
              lambda s, v: jnp.einsum("bnm,bmd->bnd", s, v,
                                      preferred_element_type=jnp.float32)
              .astype(jnp.bfloat16),
              s, v, iters=8, flops=2.0 * b2 * N * N * Dv)

    # ---- 3. softmax VPU throughput ---------------------------------------
    print("# 3. VPU softmax components (fp32 [8192,8192] = 67.1M elems)")
    x32 = jax.random.normal(key, (8192, 8192), jnp.float32)
    e = 8192 * 8192
    bench("exp", lambda x: jnp.exp(x), x32, elems=e)
    bench("exp2", lambda x: jnp.exp2(x), x32, elems=e)
    bench("full softmax (max,sub,exp,sum,div)",
          lambda x: jax.nn.softmax(x, axis=-1), x32, elems=e)
    bench("add (bandwidth floor)", lambda x: x + 1.0, x32, elems=e)
    x16 = x32.astype(jnp.bfloat16)
    bench("softmax bf16 in/out",
          lambda x: jax.nn.softmax(x.astype(jnp.float32), axis=-1)
          .astype(jnp.bfloat16), x16, elems=e)

    # ---- 4. price the full op --------------------------------------------
    print("# 4. reference: stock flash at the real shape")
    from ccedit_tpu.ops.attention import dot_product_attention
    q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    bench("flash (34,8,6144,40)", lambda q: dot_product_attention(q, q, q), q,
          iters=10, flops=4.0 * B * H * N * N * D)
    score_elems = B * H * N * N
    print(f"# score elements of the full op: {score_elems / 1e9:.2f} G")


if __name__ == "__main__":
    main()
