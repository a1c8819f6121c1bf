#!/usr/bin/env python
"""Headline benchmark: the BASELINE.md TV2V workload on real hardware.

Workload (README.md:56-57 of the reference): edit a 17-keyframe 512x768 clip,
30 DPM++ 2S Ancestral steps, CFG 7.5 (batch-doubled), SD-1.5-scale UNet +
ControlNet — ~120 UNet+ControlNet evaluations per clip plus VAE decode, as
ONE lax.scan program with a single network call site.

Prints ONE JSON line:
  {"metric": "clip_edit_latency", "value": <s>, "unit": "s",
   "vs_baseline": <baseline_s / value>}

Baseline: the project target of 10 s per clip (BASELINE.md; the reference
itself publishes no numbers).  Weights are zeros via jax.eval_shape — latency
is architecture- and compiler-bound, not weight-bound (jitted full-model init
traces take >1h on this throttled host).

Modes (BENCH_MODE):
  e2e (default) — the FULL per-clip pipeline the reference user pays
      (VERDICT r2 Weak #6): host mp4 decode -> DPT-Hybrid depth on all
      keyframes -> CLIP text forward -> denoise scan -> VAE decode -> host
      mp4 encode, each stage device-synced so the reported stage breakdown
      sums to the total by construction.
  core — denoise scan + VAE decode only (the round-1/2 metric; kept for
      round-over-round comparability, also reported in e2e detail).
  train — TV2V training-step throughput (BASELINE.md recipe: 384x512,
      12 frames, freeze policy 'spatial', remat, adamw; per-chip bs via
      BENCH_BS).  fp32 masters for trainable params, bf16 frozen storage.

Params and conditioning enter as jit ARGUMENTS — closure capture would bake
6.5GB of weights into the HLO as constants, which breaks the remote compile
service and bloats the compile cache.

Env knobs: BENCH_FRAMES/BENCH_H/BENCH_W/BENCH_STEPS to scale; BENCH_FP32=1;
BENCH_MODE=core|e2e; BENCH_SEGMENT to override scan segmenting.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ccedit_tpu.diffusion import (
    DiscreteDenoiser,
    LegacyDDPMDiscretization,
    VanillaCFG,
    make_sampler,
)
from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.unet import UNetModel
from ccedit_tpu.modules.vae import AutoencoderKL


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def hard_sync(x):
    """block_until_ready is a NO-OP under the axon RPC tunnel; fetching a
    scalar of the result is the only reliable device barrier."""
    jax.block_until_ready(x)
    jax.device_get(jnp.ravel(x)[0])
    return x


def bench_train():
    """Training-step throughput for the TV2V recipe (BASELINE.md: bs 4,
    384x512, 12 frames, mixed precision, freeze policy 'spatial' — temporal
    twins + ControlNet trainable, SD-1.5 spatial weights frozen;
    configs/example_training/sd_1_5_controlldm-test-tv2v-depthmidas.yaml).

    Mixed-precision layout: TRAINABLE params are fp32 masters (adamw needs
    them), FROZEN params are stored bf16 (never updated; compute is bf16
    anyway) — this is what fits an SD-1.5+ControlNet train step in 16 GB of
    v5e HBM alongside remat'd activations.  Per-chip batch defaults to 1
    (the recipe's global bs 4 = DP over 4 chips / grad accumulation).
    The reference publishes no training throughput -> vs_baseline 0."""
    import numpy as np
    import optax
    import flax.traverse_util as trav

    from ccedit_tpu.diffusion.loss import StandardDiffusionLoss
    from ccedit_tpu.diffusion.sigma_sampling import DiscreteSampling
    from ccedit_tpu.train.freeze import freeze_mask

    bs = int(os.environ.get("BENCH_BS", 1))
    T = int(os.environ.get("BENCH_FRAMES", 12))
    H = int(os.environ.get("BENCH_H", 384))
    W = int(os.environ.get("BENCH_W", 512))
    dtype = jnp.bfloat16

    sd15 = dict(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        transformer_depth=1, context_dim=768, dtype=dtype, use_remat=True,
        remat_policy=os.environ.get("BENCH_REMAT_POLICY") or None,
    )
    unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                     **sd15)
    cn = ControlNet2D(hint_channels=3, **sd15)
    net = CCEditNetwork(unet=unet, controlnet=cn)

    rng = jax.random.PRNGKey(0)
    h8, w8 = H // 8, W // 8
    z = jnp.zeros((bs, T, h8, w8, 4), jnp.float32)
    tt = jnp.full((bs,), 500.0)
    cond = {
        "crossattn": jnp.zeros((bs, 77, 768), dtype=dtype),
        "control_hint": jnp.zeros((bs, T, H, W, 3), dtype=dtype),
    }

    t0 = time.time()
    p_shapes = jax.eval_shape(net.init, rng, z, tt, cond)
    mask = freeze_mask(p_shapes, "spatial")
    flat_mask = trav.flatten_dict(mask)

    def materialize(shapes):
        flat = trav.flatten_dict(shapes)
        out = {}
        for k, s in flat.items():
            trainable = flat_mask[k]
            dt = (jnp.float32 if trainable else dtype) \
                if s.dtype == jnp.float32 else s.dtype
            out[k] = jnp.zeros(s.shape, dt)
        return trav.unflatten_dict(out)

    params = materialize(p_shapes)
    flat_params = trav.flatten_dict(params)
    train_tree = trav.unflatten_dict(
        {k: v for k, v in flat_params.items() if flat_mask[k]})
    frozen_tree = trav.unflatten_dict(
        {k: v for k, v in flat_params.items() if not flat_mask[k]})
    n_train = sum(v.size for v in jax.tree_util.tree_leaves(train_tree))
    n_total = sum(v.size for v in jax.tree_util.tree_leaves(params))
    init_s = time.time() - t0
    log(f"# train params {n_train/1e6:.0f}M trainable / {n_total/1e9:.2f}B "
        f"total, materialized in {init_s:.1f}s")

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    loss_obj = StandardDiffusionLoss(DiscreteSampling(), loss_type="l2")
    tx = optax.adamw(1e-4)
    opt_state = tx.init(train_tree)

    def merge(trainable, frozen):
        flat = dict(trav.flatten_dict(frozen))
        flat.update(trav.flatten_dict(trainable))
        return trav.unflatten_dict(flat)

    def train_step(trainable, frozen, opt_state, batch, key):
        def loss_fn(tr):
            p = merge(tr, frozen)

            def network(xx, ss, cc):
                return net.apply(p, xx.astype(dtype), ss, cc).astype(jnp.float32)

            losses = loss_obj(key, network, den, batch["cond"], batch["z"])
            return losses.mean()

        loss_val, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss_val

    step = jax.jit(train_step, donate_argnums=(0, 2))
    batch = {"z": z, "cond": cond}

    t0 = time.time()
    train_tree, opt_state, lv = step(
        train_tree, frozen_tree, opt_state, batch, jax.random.PRNGKey(1))
    hard_sync(lv)
    compile_s = time.time() - t0
    log(f"# train compile+first step {compile_s:.1f}s (loss={float(lv):.3f})")

    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", 5))
    times = []
    for i in range(n_steps):
        t0 = time.time()
        train_tree, opt_state, lv = step(
            train_tree, frozen_tree, opt_state, batch, jax.random.PRNGKey(2 + i))
        hard_sync(lv)
        times.append(time.time() - t0)
        log(f"# train step {i}: {times[-1]:.2f}s")
    step_s = min(times)

    print(json.dumps({
        "metric": "train_step_latency",
        "value": round(step_s, 3),
        "unit": "s",
        "vs_baseline": 0.0,
        "detail": {
            "workload": f"tv2v train bs{bs} {T}f {H}x{W} freeze=spatial "
                        "remat adamw (reference recipe "
                        "sd_1_5_controlldm-test-tv2v-depthmidas.yaml; no "
                        "published reference throughput)",
            "device": str(jax.devices()[0]),
            "params_total": n_total,
            "params_trainable": n_train,
            "frames_per_s_per_chip": round(bs * T / step_s, 3),
            "compile_s": round(compile_s, 1),
            "all_steps_s": [round(t, 3) for t in times],
        },
    }))


def main():
    if os.environ.get("BENCH_MODE") == "train":
        bench_train()
        return
    # tv2v: README.md:56-57 (30 steps, cfg 7.5).  tvi2v: README.md:63-77
    # (50 steps, cfg 7, reference-guided: CFCA center_self attention +
    # appearance ControlNet branch on the anchor-frame latent).
    workload = os.environ.get("BENCH_WORKLOAD", "tv2v")
    T = int(os.environ.get("BENCH_FRAMES", 17))
    H = int(os.environ.get("BENCH_H", 512))
    W = int(os.environ.get("BENCH_W", 768))
    # BASELINE config 5 (batched sampling sweep): B clips per device call —
    # the CLI batches num_samples the same way (cli/pipeline.py).  B>1 is a
    # throughput measurement; host stages assume one clip, so force core.
    B = int(os.environ.get("BENCH_CLIP_BS", 1))
    steps = int(os.environ.get("BENCH_STEPS", 50 if workload == "tvi2v" else 30))
    cfg_scale = 7.0 if workload == "tvi2v" else 7.5
    dtype = jnp.float32 if os.environ.get("BENCH_FP32") else jnp.bfloat16
    baseline_s = 10.0

    sd15 = dict(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        transformer_depth=1, context_dim=768, dtype=dtype,
    )
    h8, w8 = H // 8, W // 8
    if workload == "tvi2v":
        # keyframe_ref_cp_no2ndca_add_cfca yaml: UNet3D + CFCA center_self,
        # structure ControlNet, appearance ControlNet (identity hint,
        # no_add_x, no text CA) fed the anchor-frame latent
        unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                         enable_attention3d_crossframe=True,
                         st3dca_ca_type="center_self", **sd15)
        cn = ControlNet2D(hint_channels=3, **sd15)
        cn_img = ControlNet2D(hint_channels=4, input_hint_identity=True,
                              no_add_x=True, disable_text_ca=True, **sd15)
        net = CCEditNetwork(unet=unet, controlnet=cn, controlnet_img=cn_img)
    else:
        unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                         **sd15)
        cn = ControlNet2D(hint_channels=3, **sd15)
        net = CCEditNetwork(unet=unet, controlnet=cn)
    vae = AutoencoderKL(dtype=dtype)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T, h8, w8, 4), dtype=jnp.float32)
    tt = jnp.full((B,), 500.0)
    cond = {
        "crossattn": jnp.zeros((B, 77, 768), dtype=dtype),
        "control_hint": jnp.zeros((B, T, H, W, 3), dtype=dtype),
    }
    if workload == "tvi2v":
        cond["cond_feat"] = jnp.zeros((B, h8, w8, 4), dtype=dtype)
    t0 = time.time()
    # store params in the COMPUTE dtype: fp32 storage costs ~17s/clip of
    # in-program fp32->bf16 weight casts (6.4GB read + 3.2GB write per
    # execution, measured v5e) before any math happens
    def materialize(shapes):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape,
                                dtype if s.dtype == jnp.float32 else s.dtype),
            shapes)

    p_shapes = jax.eval_shape(net.init, rng, x, tt, cond)
    params = materialize(p_shapes)
    v_shapes = jax.eval_shape(
        lambda k, z: vae.init(k, z, method=AutoencoderKL.decode), rng, x[:, 0]
    )
    vae_params = materialize(v_shapes)
    init_s = time.time() - t0
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(params))
    log(f"# params materialized in {init_s:.1f}s ({n_params/1e9:.2f}B)")

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=cfg_scale)
    uc = {**cond, "crossattn": jnp.ones_like(cond["crossattn"])}
    cond_cat = guider.prepare_cond(cond, uc)
    # segment the denoise scan into a few device executions by default: the
    # whole-scan single program is ~15%% faster when the tunnel is healthy
    # (BENCH_SEGMENT=0; measured 78s vs 79s round-1) but its one big compile
    # took 360-440s when the remote compile service was degraded — the
    # segmented program compiles in ~half that and is the shape that has
    # always completed under the driver.  bf16 param storage removes the
    # in-program weight-cast overhead either way.
    rows = 2 * steps - 1
    # 59 rows: segment 15 -> executions of 15/15/15/14 rows (ragged tail —
    # no padded eval; two cached compiles serve all chunk lengths)
    default_seg = 15 if rows > 24 else 0
    segment = int(os.environ.get("BENCH_SEGMENT", default_seg))
    sampler = make_sampler(
        "dpmpp_2s_ancestral",
        discretization=LegacyDDPMDiscretization(),
        num_steps=steps,
        segment_size=segment,
    )

    def denoise_with_ctx(ctx, xx, sigma):
        p, cc = ctx
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(
            lambda a, b, c: net.apply(p, a.astype(dtype), b, c).astype(jnp.float32),
            x2, s2, cc,
        )
        return guider.combine(out, sv)

    @jax.jit
    def encode_hint_features(p, ch):
        # hint pyramid hoisted out of the scan: loop-invariant (XLA LICM
        # already hoists it per segment; this makes it once per CLIP and a
        # contract rather than a compiler-pass outcome — PERF_r3.md §10)
        return net.apply(p, ch, method=CCEditNetwork.encode_control_hint)

    def sample_clip(x0, key):
        # eager: the sampler jits each scan segment internally with params
        # threaded through jit args (one compile, chunk executions below the
        # device RPC timeout)
        cc = dict(cond_cat)
        feats = encode_hint_features(params, cc.pop("control_hint"))
        cc["control_hint_features"] = feats
        return sampler((denoise_with_ctx, (params, cc)), x0, key)

    @jax.jit
    def decode_clip(vp, latents):
        dec = vae.apply(vp, latents / 0.18215, method=AutoencoderKL.decode)
        # quantize on device: the device->host fetch of the decoded clip is
        # 4x cheaper in uint8 than fp32, and the fetch dominates the e2e
        # encode stage on this RPC-tunneled host (measured 21-41 s fp32)
        return jnp.clip((dec + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    def edit_clip(x0, key):
        return decode_clip(vae_params, sample_clip(x0, key))

    mode = os.environ.get("BENCH_MODE", "e2e")
    if B > 1:
        mode = "core"

    # ---- e2e extras: host decode, depth annotator, text encoder, encode ----
    if mode == "e2e":
        import tempfile

        import numpy as np

        from ccedit_tpu.conditioning.annotators.chunked import chunked_depth_hint
        from ccedit_tpu.conditioning.annotators.dpt_midas import DPTHybrid
        from ccedit_tpu.data.video import load_video_keyframes, save_video_frames
        from ccedit_tpu.modules.clip import CLIPTextModel

        tmpdir = tempfile.mkdtemp(prefix="bench_e2e_")
        src_path = os.path.join(tmpdir, "src.mp4")
        out_path = os.path.join(tmpdir, "edited.mp4")
        # smooth moving-gradient source clip: codec-representative content
        # (a pure-noise clip is the pathological worst case for mp4 — it
        # inflated the decode stage to 5-8.5 s vs <1 s for real video)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        yy, xx = yy / H, xx / W
        src = np.stack([
            np.stack([
                np.sin(2 * np.pi * (2 * xx + 0.05 * t + 0.3 * ch)) *
                np.cos(2 * np.pi * (yy + 0.03 * t))
                for ch in range(3)
            ], axis=-1)
            for t in range(34)
        ]).astype(np.float32)
        save_video_frames(src, src_path, fps=18.0)

        dpt = DPTHybrid(dtype=dtype)
        clipm = CLIPTextModel(dtype=dtype)
        frames_shape = jnp.zeros((T, H, W, 3), jnp.float32)
        dpt_params = materialize(jax.eval_shape(dpt.init, rng, frames_shape))
        tokens = jnp.zeros((2, 77), jnp.int32)
        clip_params = materialize(jax.eval_shape(clipm.init, rng, tokens))

        # chunk-pipelined depth: device_put(chunk)+DPT(chunk) dispatched
        # per 5-frame chunk (uploads overlap compute), ONE clip-global MiDaS
        # postprocess at the end — exact DepthMidasEncoder semantics
        make_hint = chunked_depth_hint(dpt, chunk=5, dtype=dtype)

        @jax.jit
        def embed_text(cp, toks):
            return clipm.apply(cp, toks)

    x0 = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype=jnp.float32)
    t0 = time.time()
    for attempt in range(3):
        try:
            out = hard_sync(edit_clip(x0, jax.random.PRNGKey(2)))
            if mode == "e2e":
                frames_u8 = load_video_keyframes(
                    src_path, target_fps=6.0, num_keyframes=T, size_hw=(H, W),
                    out_dtype="uint8")
                hard_sync(make_hint(dpt_params, frames_u8))
                hard_sync(embed_text(clip_params, tokens))
            break
        except Exception as e:  # transient remote-compile failures
            log(f"# compile attempt {attempt} failed: {type(e).__name__}: {e}")
            if attempt == 2:
                raise
            time.sleep(10)
    compile_s = time.time() - t0
    log(f"# compile+first run {compile_s:.1f}s")

    times = []
    stage_breakdowns = []
    for i in range(3):
        if i:
            time.sleep(45)  # sustained load degrades successive runs ~2-4x
            # on this tunnel (98 -> 351 -> 444s observed); idle gaps recover
        if mode == "e2e":
            # full pipeline, each stage synced so stages sum to the total
            stages = {}
            t0 = time.time()
            frames_u8 = load_video_keyframes(
                src_path, target_fps=6.0, num_keyframes=T, size_hw=(H, W),
                out_dtype="uint8")
            t1 = time.time(); stages["decode_s"] = t1 - t0
            hint = hard_sync(make_hint(dpt_params, frames_u8))
            t2 = time.time(); stages["depth_s"] = t2 - t1
            txt = hard_sync(embed_text(clip_params, tokens))
            t3 = time.time(); stages["text_s"] = t3 - t2
            lat = sample_clip(x0, jax.random.PRNGKey(3 + i))
            hard_sync(lat)
            t4 = time.time(); stages["scan_s"] = t4 - t3
            dec = hard_sync(decode_clip(vae_params, lat))
            t5 = time.time(); stages["vae_s"] = t5 - t4
            save_video_frames(jax.device_get(dec[0]), out_path, fps=6.0)
            t6 = time.time(); stages["encode_s"] = t6 - t5
            times.append(t6 - t0)
            stage_breakdowns.append({k: round(v, 3) for k, v in stages.items()})
            log(f"# e2e run {i}: {t6 - t0:.1f}s {stage_breakdowns[-1]}")
        else:
            t0 = time.time()
            out = hard_sync(edit_clip(x0, jax.random.PRNGKey(3 + i)))
            times.append(time.time() - t0)
    latency = min(times)

    from ccedit_tpu.ops.attention import quantized_qk_enabled
    from ccedit_tpu.ops.quant import quantized_matmul_enabled

    # ---- exact model-FLOP accounting -> MFU (VERDICT r4 Next #4) ----
    # Constants are XLA's own post-optimization cost_analysis()["flops"] of
    # the EXACT programs timed here (one CFG-doubled denoise row with the
    # hint pyramid hoisted, the pyramid itself, the fused VAE decode), at
    # the headline geometry 17f 512x768 — computed by scripts/flops_nfe.py
    # (re-run it if the network changes).  The VAE count independently
    # reconciles with the hand-derived 64.56 TFLOP of docs/PERF_r3.md §9.
    NFE_TFLOPS = {"tv2v": 62.717, "tvi2v": 76.758}
    HINT_TFLOPS = {"tv2v": 0.747, "tvi2v": 0.747}
    VAE_TFLOPS = 64.386
    PEAK_TFLOPS = 197.0  # v5e bf16 (2 MXU pods x 8 MiB tiles @ 940 MHz)
    mfu_fields = {}
    if (T, H, W) == (17, 512, 768) and B == 1 and workload in NFE_TFLOPS:
        rows_total = 2 * steps - 1
        clip_tflops = (rows_total * NFE_TFLOPS[workload]
                       + HINT_TFLOPS[workload] + VAE_TFLOPS)
        core_latency = latency  # overwritten below for e2e
        mfu_fields = {
            "model_tflops_per_nfe": NFE_TFLOPS[workload],
            "model_tflops_per_clip": round(clip_tflops, 1),
            "peak_tflops_bf16": PEAK_TFLOPS,
        }

    detail = {
        "workload": f"{workload} bs{B} {T}f {H}x{W} {steps} steps DPM++2S "
                    f"CFG{cfg_scale} + VAE decode",
        "mode": mode,
        "dtype": "bfloat16" if dtype == jnp.bfloat16 else "float32",
        "int8": bool(quantized_matmul_enabled() or quantized_qk_enabled()),
        "device": str(jax.devices()[0]),
        "params": n_params,
        "clip_batch": B,
        "frames_per_s_per_chip": round(B * T / latency, 3),
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
        "all_runs_s": [round(t, 3) for t in times],
    }
    if mode == "e2e":
        best = stage_breakdowns[times.index(latency)]
        detail["stages"] = best
        detail["core_s"] = round(best["scan_s"] + best["vae_s"], 3)
        detail["workload"] = (
            f"{workload} {T}f {H}x{W} {steps} steps DPM++2S CFG{cfg_scale}, "
            "mp4 decode + DPT-Hybrid depth + CLIP text + VAE decode + "
            "mp4 encode")
        if mfu_fields:
            core_latency = detail["core_s"]
    if mfu_fields:
        # MFU over the device-compute (core) window: model FLOPs the clip
        # needs / time / chip peak.  Host stages (mp4, depth, text) are
        # excluded — they are latency, not MXU work.
        mfu_fields["mfu"] = round(
            mfu_fields["model_tflops_per_clip"] / core_latency / PEAK_TFLOPS, 4)
        detail.update(mfu_fields)

    print(
        json.dumps(
            {
                "metric": "clip_edit_latency",
                "value": round(latency, 3),
                "unit": "s",
                "vs_baseline": round(baseline_s / latency, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
