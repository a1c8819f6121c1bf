#!/usr/bin/env python
"""Round-3 forensics: where do ~50s of the 79s headline go?

Round-2 left a ~2x accounting discrepancy (VERDICT Weak #2):
  * chained-loop NFE timing: 967 ms/row  -> 59 rows = 57 s
  * marginal-row (2 vs 6 step scans):  460 ms/row -> 59 rows = 27 s + 0.5 VAE
  * measured headline: 79.3 s

This script isolates the per-execution cost model with THREE experiments,
all sharing ONE compile each (dynamic trip counts -> no recompile sweep):

  A. arg-staging cost: jit f(params, x) = x+1 vs f(x) = x+1.  If the axon
     tunnel stages/validates the 2.4 GB params per call, A shows it.
  B. rows-per-execution sweep: jit g(params, cond, x, n) running n NFE rows
     in a lax.while_loop with TRACED n.  Times at n in {1,2,4,8,15,30,59}
     give intercept (fixed per-execution cost) + slope (true s/row) +
     curvature (in-execution sustained-load throttling).
  C. same-n repeatability: n=15 three times with no cooldown, then with
     45 s cooldowns, to see the throttle's time constant.

Usage: python scripts/forensic_overhead.py [A] [B] [C]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ccedit_tpu.diffusion import DiscreteDenoiser, LegacyDDPMDiscretization, VanillaCFG
from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.unet import UNetModel


def log(msg):
    print(msg, flush=True)


def sync(x):
    jax.device_get(jnp.ravel(x)[0])


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C"}
    T, H, W = 17, 512, 768
    dtype = jnp.bfloat16

    sd15 = dict(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        transformer_depth=1, context_dim=768, dtype=dtype,
    )
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **sd15)
    cn = ControlNet2D(hint_channels=3, **sd15)
    net = CCEditNetwork(unet=unet, controlnet=cn)

    h8, w8 = H // 8, W // 8
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, T, h8, w8, 4), dtype=jnp.float32)
    tt = jnp.array([500.0])
    cond = {
        "crossattn": jnp.zeros((1, 77, 768), dtype=dtype),
        "control_hint": jnp.zeros((1, T, H, W, 3), dtype=dtype),
    }
    p_shapes = jax.eval_shape(net.init, rng, x, tt, cond)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        p_shapes,
    )
    n_bytes = sum(v.size * v.dtype.itemsize for v in jax.tree_util.tree_leaves(params))
    n_leaves = len(jax.tree_util.tree_leaves(params))
    log(f"# params: {n_bytes/1e9:.2f} GB in {n_leaves} leaves")

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=7.5)
    uc = {**cond, "crossattn": jnp.ones_like(cond["crossattn"])}
    cond_cat = guider.prepare_cond(cond, uc)

    # ---- A: arg-staging cost -------------------------------------------
    if "A" in which:
        @jax.jit
        def tiny_with_params(p, xx):
            return xx + 1.0

        @jax.jit
        def tiny_no_params(xx):
            return xx + 1.0

        sync(tiny_no_params(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(tiny_no_params(x))
            ts.append(time.perf_counter() - t0)
        log(f"A tiny no-params   : {['%.3f' % t for t in ts]} s  (RPC floor)")

        sync(tiny_with_params(params, x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(tiny_with_params(params, x))
            ts.append(time.perf_counter() - t0)
        log(f"A tiny with-params : {['%.3f' % t for t in ts]} s  (arg staging)")

        # and with params + full cond (the real run_chunk arg set)
        @jax.jit
        def tiny_full_args(p, cc, xx):
            return xx + 1.0

        sync(tiny_full_args(params, cond_cat, x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(tiny_full_args(params, cond_cat, x))
            ts.append(time.perf_counter() - t0)
        log(f"A tiny full-args   : {['%.3f' % t for t in ts]} s")

    # ---- B: rows-per-execution with traced trip count ------------------
    sigmas_np = LegacyDDPMDiscretization()(30)
    sig_rows = jnp.asarray(
        np.resize(sigmas_np[:-1], 64).astype(np.float32))  # 64 query sigmas

    def denoise_row(p, cc, xx, sigma):
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(
            lambda a, b, c: net.apply(p, a.astype(dtype), b, c).astype(jnp.float32),
            x2, s2, cc,
        )
        return guider.combine(out, sv)

    @jax.jit
    def run_n_rows(p, cc, x0, n):
        def body(state):
            i, xx = state
            d = denoise_row(p, cc, xx, sig_rows[i])
            # cheap euler-ish update keeps the dependence chain row-to-row
            xx = xx + 0.05 * (d - xx)
            return (i + 1, xx)

        def cond_fn(state):
            return state[0] < n

        _, xf = jax.lax.while_loop(cond_fn, body, (jnp.int32(0), x0))
        return xf

    if "B" in which or "C" in which:
        x0 = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype=jnp.float32)
        t0 = time.perf_counter()
        sync(run_n_rows(params, cond_cat, x0, jnp.int32(1)))
        log(f"B compile+first(n=1): {time.perf_counter() - t0:.1f} s")

    if "B" in which:
        results = {}
        for n in (1, 2, 4, 8, 15, 30, 59):
            time.sleep(20)
            t0 = time.perf_counter()
            sync(run_n_rows(params, cond_cat, x0, jnp.int32(n)))
            dt = time.perf_counter() - t0
            results[n] = dt
            log(f"B n={n:3d}: {dt:8.2f} s   ({dt/n*1000:7.0f} ms/row)")
        ks = sorted(results)
        for a, b in zip(ks[:-1], ks[1:]):
            marg = (results[b] - results[a]) / (b - a)
            log(f"B marginal {a}->{b}: {marg*1000:7.0f} ms/row")

    if "C" in which:
        log("C back-to-back n=15 (no cooldown):")
        for i in range(3):
            t0 = time.perf_counter()
            sync(run_n_rows(params, cond_cat, x0, jnp.int32(15)))
            log(f"C   run {i}: {time.perf_counter() - t0:8.2f} s")
        log("C n=15 with 45 s cooldowns:")
        for i in range(2):
            time.sleep(45)
            t0 = time.perf_counter()
            sync(run_n_rows(params, cond_cat, x0, jnp.int32(15)))
            log(f"C   run {i}: {time.perf_counter() - t0:8.2f} s")


if __name__ == "__main__":
    main()
