#!/usr/bin/env python
"""AOT warm-start experiment (VERDICT r3 Next #6).

Question: can a second process skip the ~246 s "warm" compile path
(persistent-cache load + validation through the axon remote-compile
tunnel, PERF_r3.md §8) by serializing the COMPILED executable
(jax.experimental.serialize_executable — PJRT executable bytes, not
StableHLO; jax.export would re-compile on load) and loading it directly?

Protocol (same program both phases — one 15-row TV2V scan segment at the
headline geometry, the dominant compile unit):
  phase save:  lower+compile, time it, serialize executable to disk.
  phase load:  fresh process, deserialize_and_load + run one execution,
               time to first result.  Compare against the ~246 s warm
               path and the ~1000 s cold path.

Usage: python scripts/aot_warmstart.py save|load [--tiny]
`--tiny` runs a small geometry first to validate the mechanism cheaply.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PHASE = sys.argv[1] if len(sys.argv) > 1 else "save"
TINY = "--tiny" in sys.argv
OUT = "/tmp/aot_exec_tiny.pkl" if TINY else "/tmp/aot_exec.pkl"

# NOTE: deliberately NOT enabling the persistent compilation cache here —
# the experiment isolates executable-load cost from cache-service cost.


def log(m):
    print(m, file=sys.stderr, flush=True)


def build():
    from ccedit_tpu.diffusion import (
        DiscreteDenoiser, LegacyDDPMDiscretization, VanillaCFG, make_sampler,
    )
    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    dtype = jnp.bfloat16
    if TINY:
        kw = dict(in_channels=4, model_channels=32, out_channels=4,
                  num_res_blocks=1, attention_resolutions=(2, 1),
                  channel_mult=(1, 2), num_heads=2, transformer_depth=1,
                  context_dim=16, dtype=dtype)
        T, Hl, Wl, ctx_d, ctx_l = 3, 8, 8, 16, 7
    else:
        kw = dict(in_channels=4, model_channels=320, out_channels=4,
                  num_res_blocks=2, attention_resolutions=(4, 2, 1),
                  channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                  context_dim=768, dtype=dtype)
        T, Hl, Wl, ctx_d, ctx_l = 17, 64, 96, 768, 77
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **kw)
    cn = ControlNet2D(hint_channels=3, **kw)
    net = CCEditNetwork(unet=unet, controlnet=cn)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, T, Hl, Wl, 4), jnp.float32)
    tt = jnp.array([500.0])
    cond = {"crossattn": jnp.zeros((1, ctx_l, ctx_d), dtype=dtype),
            "control_hint": jnp.zeros((1, T, Hl * 8, Wl * 8, 3), dtype=dtype)}
    p_shapes = jax.eval_shape(net.init, rng, x, tt, cond)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32
                            else s.dtype), p_shapes)

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=7.5)
    uc = {**cond, "crossattn": jnp.ones_like(cond["crossattn"])}
    cond_cat = guider.prepare_cond(cond, uc)
    steps = 2 if TINY else 8  # 15-row segment equivalent: 2*8-1=15 rows
    sampler = make_sampler("dpmpp_2s_ancestral",
                           discretization=LegacyDDPMDiscretization(),
                           num_steps=steps)

    def denoise_with_ctx(ctx, xx, sigma):
        p, cc = ctx
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(lambda a, b, c: net.apply(p, a.astype(jnp.bfloat16), b, c)
                  .astype(jnp.float32), x2, s2, cc)
        return guider.combine(out, sv)

    def sample_fn(p, cc, x0, key):
        return sampler((denoise_with_ctx, (p, cc)), x0, key)

    return sample_fn, params, cond_cat, x


def main():
    t_start = time.time()
    sample_fn, params, cond_cat, x = build()
    log(f"# build {time.time()-t_start:.1f}s; device {jax.devices()[0]}")
    x0 = jnp.zeros(x.shape, jnp.float32)
    key = jax.random.PRNGKey(1)
    jitted = jax.jit(sample_fn)

    if PHASE == "save":
        t0 = time.time()
        lowered = jitted.lower(params, cond_cat, x0, key)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        log(f"# lower {t1-t0:.1f}s  compile {t2-t1:.1f}s")
        from jax.experimental.serialize_executable import serialize

        t0 = time.time()
        payload, in_tree, out_tree = serialize(compiled)
        with open(OUT, "wb") as f:
            pickle.dump({"payload": payload, "in_tree": in_tree,
                         "out_tree": out_tree}, f)
        log(f"# serialize+write {time.time()-t0:.1f}s "
            f"({os.path.getsize(OUT)/1e6:.1f} MB -> {OUT})")
        t0 = time.time()
        out = compiled(params, cond_cat, x0, key)
        jax.block_until_ready(out)
        jax.device_get(jnp.ravel(out)[0])
        log(f"# first exec {time.time()-t0:.1f}s")
    elif PHASE == "load":
        from jax.experimental.serialize_executable import deserialize_and_load

        t0 = time.time()
        with open(OUT, "rb") as f:
            blob = pickle.load(f)
        t1 = time.time()
        compiled = deserialize_and_load(blob["payload"], blob["in_tree"],
                                        blob["out_tree"])
        t2 = time.time()
        out = compiled(params, cond_cat, x0, key)
        jax.block_until_ready(out)
        jax.device_get(jnp.ravel(out)[0])
        t3 = time.time()
        log(f"# read {t1-t0:.1f}s  deserialize+load {t2-t1:.1f}s  "
            f"first exec {t3-t2:.1f}s  TOTAL since process start "
            f"{t3-t_start:.1f}s")
    else:
        raise SystemExit(f"unknown phase {PHASE!r}")


if __name__ == "__main__":
    main()
