#!/usr/bin/env python
"""8-chip projection evidence (VERDICT r2 Next #3).

Part ``hlo`` (virtual 8-device CPU mesh, no TPU needed):
  compile the frame/height-sharded single-clip sampling program at the
  headline shape, parse the optimized HLO, and report every collective with
  its payload bytes and an ICI latency estimate (v5e ring).

Part ``shard`` (real chip):
  chained-loop timing of one NFE at the per-shard shapes an 8-way clip
  shard actually runs (H/8 rows, and the T=2/T=3 frame-shard variants), the
  scaling unit for the 8-chip projection.

Usage: python scripts/audit_collectives.py hlo|shard
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PART = sys.argv[1] if len(sys.argv) > 1 else "hlo"

if PART == "hlo":
    # env alone does NOT stick (the axon plugin overrides JAX_PLATFORMS);
    # XLA_FLAGS is read lazily + the platform must be forced via jax.config
    # before the first backend query (same recipe as tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if PART == "hlo":
    jax.config.update("jax_platform_name", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# v5e ICI: ~45 GB/s per direction per axis (scaling-book numbers); an 8-chip
# slice is a 2x4 torus — we model the data-axis ring at one axis's bandwidth
ICI_BW = 45e9


def parse_collectives(hlo: str):
    """Yield (op, result_shape_str, bytes) — shared parser; the pytest
    regression guard (tests/test_collective_census.py) uses the same one."""
    from ccedit_tpu.parallel.audit import parse_collectives as _pc

    return [(c.op, c.shape, c.nbytes) for c in _pc(hlo)]


def ring_cost_s(op: str, nbytes: int, n: int = 8) -> float:
    if op in ("all-gather", "reduce-scatter"):
        return nbytes * (n - 1) / n / ICI_BW
    if op == "all-reduce":
        return 2.0 * nbytes * (n - 1) / n / ICI_BW
    if op == "collective-permute":
        return nbytes / ICI_BW
    return nbytes / ICI_BW  # all-to-all rough


def hlo_part():
    from ccedit_tpu.diffusion import (
        DiscreteDenoiser, LegacyDDPMDiscretization, VanillaCFG, make_sampler,
    )
    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel
    from ccedit_tpu.parallel.mesh import make_mesh
    from ccedit_tpu.parallel.sampling import clip_sharding, pick_clip_axis

    assert len(jax.devices()) == 8, jax.devices()
    plan = make_mesh(data=8)
    T, H, W = 17, 512, 768
    steps = int(os.environ.get("AUDIT_STEPS", 3))
    dtype = jnp.bfloat16

    sd15 = dict(in_channels=4, model_channels=320, out_channels=4,
                num_res_blocks=2, attention_resolutions=(4, 2, 1),
                channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                context_dim=768, dtype=dtype)
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **sd15)
    cn = ControlNet2D(hint_channels=3, **sd15)
    net = CCEditNetwork(unet=unet, controlnet=cn)

    h8, w8 = H // 8, W // 8
    shape = (1, T, h8, w8, 4)
    axis = pick_clip_axis(plan, shape)
    print(f"# sharded clip axis = {axis} ({'frame' if axis == 1 else 'height'})",
          flush=True)
    out_sh = clip_sharding(plan, len(shape), axis)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros(shape, jnp.float32)
    tt = jnp.array([500.0])
    cond = {"crossattn": jnp.zeros((1, 77, 768), dtype=dtype),
            "control_hint": jnp.zeros((1, T, H, W, 3), dtype=dtype)}
    p_shapes = jax.eval_shape(net.init, rng, x, tt, cond)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        p_shapes)

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=7.5)
    uc = {**cond, "crossattn": jnp.ones_like(cond["crossattn"])}
    cond_cat = guider.prepare_cond(cond, uc)
    sampler = make_sampler("dpmpp_2s_ancestral",
                           discretization=LegacyDDPMDiscretization(),
                           num_steps=steps)

    def denoise_with_ctx(ctx, xx, sigma):
        p, cc = ctx
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(lambda a, b, c: net.apply(p, a.astype(dtype), b, c)
                  .astype(jnp.float32), x2, s2, cc)
        return guider.combine(out, sv)

    def sample_fn(p, cc, x0, key):
        return sampler((denoise_with_ctx, (p, cc)), x0, key)

    # shard the inputs the way parallel/sampling.py does
    params = jax.device_put(params, plan.replicated())
    cc = {}
    for k, v in cond_cat.items():
        if k == "control_hint":
            cc[k] = jax.device_put(v, clip_sharding(plan, v.ndim, axis))
        else:
            cc[k] = jax.device_put(v, plan.replicated())
    x0 = jax.device_put(jnp.zeros(shape, jnp.float32), out_sh)
    key = jax.random.PRNGKey(1)

    from ccedit_tpu.ops.attention import mesh_context

    jitted = jax.jit(sample_fn, out_shardings=out_sh)
    print("# lowering + compiling (CPU, 8 virtual devices)...", flush=True)
    # mesh_context routes big attentions through shard_map (q sharded,
    # k/v replicated) exactly as the real multi-chip TPU path does —
    # without it GSPMD shards the plain einsum and the collective mix
    # (fp32 operand gathers) is not what production runs
    with mesh_context(plan.mesh):
        lowered = jitted.lower(params, cc, x0, key)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    rows = 2 * steps - 1
    cols = parse_collectives(hlo)
    # the scan body appears ONCE in HLO; count per-program then scale
    from collections import Counter
    agg = {}
    for op, shape_s, nbytes in cols:
        k = (op, shape_s)
        if k not in agg:
            agg[k] = [0, nbytes]
        agg[k][0] += 1
    total_bytes = sum(n * b for (op, _), (n, b) in agg.items())
    total_cost = sum(n * ring_cost_s(op, b) for (op, _), (n, b) in agg.items())
    print(f"\n# collectives in the {steps}-step ({rows}-row) program:")
    print(f"{'op':20s} {'count':>5s} {'bytes each':>12s} {'ring est':>10s}  shape")
    for (op, shape_s), (n, b) in sorted(agg.items(),
                                        key=lambda kv: -kv[1][0] * kv[1][1]):
        print(f"{op:20s} {n:5d} {b:12,d} {ring_cost_s(op, b)*1e6:8.1f}us  {shape_s}")
    print(f"\n# totals: {len(cols)} collective sites, {total_bytes/1e6:.1f} MB "
          f"traffic/program, ~{total_cost*1e3:.2f} ms ring time/program")
    print(f"# per scan row (program has {rows} rows in one scan → HLO shows "
          f"the body once; per-row traffic = program traffic / rows if all "
          f"collectives sit in the body)")
    # dump for inspection (large; kept out of the repo)
    out_path = "/tmp/hlo_sharded_sample.txt"
    with open(out_path, "w") as f:
        f.write(hlo)
    print(f"# full HLO written to {out_path} ({len(hlo)/1e6:.1f} MB)")


def shard_part():
    import time

    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    dtype = jnp.bfloat16
    sd15 = dict(in_channels=4, model_channels=320, out_channels=4,
                num_res_blocks=2, attention_resolutions=(4, 2, 1),
                channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                context_dim=768, dtype=dtype)
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True, **sd15)
    cn = ControlNet2D(hint_channels=3, **sd15)
    net = CCEditNetwork(unet=unet, controlnet=cn)
    key = jax.random.PRNGKey(0)

    def bench_nfe(name, T, Hl, Wl, i1=2, i2=8, n=3):
        """Slope-timed (docs/PERF_r3.md §6): immune to the ~30 ms fixed
        per-execution cost."""
        x = jnp.zeros((2, T, Hl, Wl, 4), jnp.float32)
        tt = jnp.array([500.0, 500.0])
        cond = {"crossattn": jnp.zeros((2, 77, 768), dtype),
                "control_hint": jnp.zeros((2, T, Hl * 8, Wl * 8, 3), dtype)}
        p_shapes = jax.eval_shape(net.init, key, x, tt, cond)
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape,
                                dtype if s.dtype == jnp.float32 else s.dtype),
            p_shapes)

        def make(iters):
            def looped(xx, p, c):
                def body(_, carry):
                    out = net.apply(p, carry, tt, c)
                    return carry + (1e-12 * jnp.mean(out)).astype(carry.dtype)
                return jax.lax.fori_loop(0, iters, body, xx)
            return jax.jit(looped)

        f1, f2 = make(i1), make(i2)
        jax.device_get(jnp.ravel(f1(x, params, cond))[0])
        jax.device_get(jnp.ravel(f2(x, params, cond))[0])

        def t(f):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                jax.device_get(jnp.ravel(f(x, params, cond))[0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        ms = (t(f2) - t(f1)) * 1e3 / (i2 - i1)
        print(f"{name:44s} {ms:9.1f} ms/NFE", flush=True)
        return ms

    print(f"# device: {jax.devices()[0]}")
    full = bench_nfe("full clip (17f, 64x96 latent)", 17, 64, 96, i1=2, i2=5)
    h8 = bench_nfe("H/8 shard (17f, 8x96 latent)", 17, 8, 96)
    t2 = bench_nfe("T-shard T=2 (full 64x96)", 2, 64, 96)
    t3 = bench_nfe("T-shard T=3 (full 64x96)", 3, 64, 96)
    print(f"\n# per-shard/full ratios: H/8 {h8/full:.3f} (ideal 0.125), "
          f"T=2 {t2/full:.3f} (ideal {2/17:.3f}), T=3 {t3/full:.3f} "
          f"(ideal {3/17:.3f})")


if PART == "hlo":
    hlo_part()
elif PART == "shard":
    shard_part()
else:
    raise SystemExit(f"unknown part {PART!r}")
