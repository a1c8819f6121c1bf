"""Shared inference pipeline for the sampling CLIs.

Behavioural parity targets: scripts/sampling/sampling_tv2v.py (:23-521) and
sampling_tv2v_ref.py (:23-550): prompt/video list handling, model load,
per-chunk sampling loop, x-prior mixing, sdedit, log_info.json resume ledger,
mp4/gif/original/hint saving.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import build_engine, load_config
from ..data.video import (
    load_image,
    load_video_keyframes,
    save_video_frames,
    to_uint8,
)
from ..diffusion.guidance import VanillaCFG
from ..utils.jax_cache import enable_compilation_cache

# user-facing CLIs share bench.py's persistent compile cache: a repeat
# invocation at the same shapes skips the 130-900s remote compile entirely
enable_compilation_cache()

SAMPLER_NAMES = {
    "EulerEDMSampler": "euler",
    "HeunEDMSampler": "heun",
    "EulerAncestralSampler": "euler_ancestral",
    "DPMPP2SAncestralSampler": "dpmpp_2s_ancestral",
    "DPMPP2MSampler": "dpmpp_2m",
    "LinearMultistepSampler": "lms",
}


def base_parser() -> argparse.ArgumentParser:
    """Flag surface mirrors sampling_tv2v.py:25-97."""
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--config_path", type=str, default="")
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--basemodel_path", type=str, default="")
    p.add_argument("--basemodel_listpath", type=str, default="")
    p.add_argument("--lora_path", type=str, default="")
    p.add_argument("--lora_strength", type=float, default=0.8)
    p.add_argument("--vae_path", type=str, default="")
    p.add_argument("--video_path", type=str, default="")
    p.add_argument("--prompt_listpath", type=str, default="")
    p.add_argument("--video_listpath", type=str, default="")
    p.add_argument("--videos_directory", type=str, default="")
    p.add_argument("--json_path", type=str, default="")
    p.add_argument("--videos_root", type=str, default="")
    p.add_argument("--save_path", type=str, default="outputs/demo/tv2v")
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--W", type=int, default=384)
    p.add_argument("--original_fps", type=int, default=20)
    p.add_argument("--target_fps", type=int, default=3)
    p.add_argument("--num_keyframes", type=int, default=9)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="ugly, low quality")
    p.add_argument("--add_prompt", type=str, default="masterpiece, high quality")
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--sampler_name", type=str, default="DPMPP2SAncestralSampler",
                   choices=sorted(SAMPLER_NAMES))
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--prior_coefficient_x", type=float, default=0.0)
    p.add_argument("--prior_coefficient_noise", type=float, default=1.0)
    p.add_argument("--sdedit_denoise_strength", type=float, default=0.0)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--disable_check_repeat", action="store_true")
    p.add_argument("--save_type", type=str, default="mp4", choices=["gif", "mp4"])
    p.add_argument("--inpainting_mode", action="store_true")
    p.add_argument("--tokenizer_assets", type=str, default="",
                   help="dir with CLIP vocab.json+merges.txt")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--fake_annotator", action="store_true",
                   help="allow the luminance pseudo-depth stand-in when no "
                        "annotator backbone weights are configured (debug)")
    p.add_argument("--exact_shapes", action="store_true",
                   help="disable shape bucketing: compile at the exact "
                        "requested (H, W, T, steps) geometry instead of "
                        "snapping onto the supported grid (utils/buckets.py)")
    return p


def gather_jobs(args) -> List[Dict]:
    """Resolve (video, prompt[, reference]) work items from the various list
    inputs (sampling_tv2v.py:107-178)."""
    jobs: List[Dict] = []
    if args.json_path:
        data = json.loads(Path(args.json_path).read_text())
        for item in data if isinstance(data, list) else data.get("videos", []):
            jobs.append({
                "video": os.path.join(args.videos_root, item["video_path"])
                if args.videos_root else item["video_path"],
                "prompt": item.get("edit_prompt") or item.get("caption", ""),
            })
    elif args.video_listpath and args.prompt_listpath:
        vids = Path(args.video_listpath).read_text().splitlines()
        prompts = Path(args.prompt_listpath).read_text().splitlines()
        jobs = [{"video": v, "prompt": p} for v, p in zip(vids, prompts) if v.strip()]
    elif args.videos_directory:
        for f in sorted(Path(args.videos_directory).iterdir()):
            jobs.append({"video": str(f), "prompt": args.prompt})
    else:
        jobs = [{"video": args.video_path, "prompt": args.prompt}]
    return jobs


def load_engine(args, num_steps: int):
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = load_config(args.config_path)
    engine = build_engine(
        cfg,
        asset_dir=args.tokenizer_assets or None,
        dtype=dtype,
        guider_scale=args.cfg_scale,
        num_steps=num_steps,
    )
    engine.guider = VanillaCFG(scale=args.cfg_scale)
    if getattr(args, "fake_annotator", False):
        from ..conditioning.annotators.base import AnnotatorEmbedder

        for spec in engine.conditioner.specs:
            if isinstance(spec.embedder, AnnotatorEmbedder):
                spec.embedder.allow_fake = True
    from ..diffusion import make_discretization, make_sampler

    strength = args.sdedit_denoise_strength if args.sdedit_denoise_strength > 0 else None
    extra = {}
    if SAMPLER_NAMES[args.sampler_name] == "dpmpp_2s_ancestral":
        # segment long full-res runs into sub-timeout device executions
        # (axon kills single executions over ~2 min); short runs stay as one
        # scan (identity padding would waste network evals)
        rows = 2 * num_steps - 1
        pixels = args.H * args.W * args.num_keyframes
        if rows > 24 and pixels > 8 * 256 * 256:
            # pick the segment size (12..20) minimizing padded rows
            extra["segment_size"] = min(
                range(12, 21), key=lambda s: (-(-rows // s) * s - rows, -s))
    engine.sampler = make_sampler(
        SAMPLER_NAMES[args.sampler_name],
        discretization=make_discretization(
            "legacy_ddpm", **({"img2img_strength": strength} if strength else {})
        ),
        num_steps=num_steps,
        **extra,
    )
    return engine, cfg


def _unet_convert_kwargs(engine) -> Dict:
    net = engine.network
    return dict(
        channel_mult=tuple(net.unet.channel_mult),
        num_res_blocks=net.unet.num_res_blocks,
        attention_resolutions=tuple(net.unet.attention_resolutions),
        transformer_depth=net.unet.transformer_depth,
        model_channels=net.unet.model_channels,
        use_linear=net.unet.use_linear_in_transformer,
    )


def _convert_ckpt(engine, path: str, base_model: bool = False) -> Dict:
    """Convert a torch checkpoint into (a partial) engine param tree.
    base_model=True: a plain SD-1.5 base model — spatial UNet + VAE + CLIP
    only (model_load_ckpt(..., True), sampling_tv2v.py:209)."""
    from ..io.torch_convert import convert_sd_checkpoint, load_torch_state_dict

    sd = load_torch_state_dict(path)
    net = engine.network
    return convert_sd_checkpoint(
        sd,
        video=net.unet.is_video,
        cfca=net.unet.enable_attention3d_crossframe,
        has_controlnet=(not base_model) and net.controlnet is not None,
        has_controlnet_img=(not base_model) and net.controlnet_img is not None,
        strict=False,
        **_unet_convert_kwargs(engine),
    )


def load_params(engine, args, example_batch) -> Dict:
    rng = jax.random.PRNGKey(args.seed)
    # fast=True: materialize shapes instead of tracing the full flax init
    # (an eager SD-scale init takes >1h on this host); checkpoints overlay
    # the real weights below
    params = engine.init_params(rng, example_batch, fast=True)
    if args.ckpt_path:
        converted = _convert_ckpt(engine, args.ckpt_path)
        params = _merge_params(params, converted)
        engine._wire_vae_embedders(params["vae"])
    if getattr(args, "bf16", False):
        # store weights in the compute dtype: fp32 storage costs ~17s/clip of
        # in-program fp32->bf16 casts on v5e (6.4GB read + 3.2GB write per
        # execution) before any math happens (docs/PERF_r2.md)
        params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
            params,
        )
    return params


def apply_basemodel(engine, params: Dict, path: str) -> Dict:
    """Overlay a swapped SD base model's spatial weights
    (sampling_tv2v.py:201-209)."""
    print(f"--> load a new base model from {path}")
    converted = _convert_ckpt(engine, path, base_model=True)
    params = _merge_params(params, converted)
    engine._wire_vae_embedders(params["vae"])
    return params


def apply_lora(engine, params: Dict, args) -> Dict:
    """Merge a kohya LoRA into the current weights
    (sampling_tv2v.py:211-235 + convert_load_lora)."""
    from ..io.lora import merge_kohya_lora
    from ..io.torch_convert import load_torch_state_dict

    print(f"--> load a new LoRA model from {args.lora_path}")
    return merge_kohya_lora(
        params, load_torch_state_dict(args.lora_path), args.lora_strength
    )


def apply_vae(engine, params: Dict, path: str) -> Dict:
    """Swap the first-stage VAE (sampling_tv2v.py:237-260)."""
    from ..io.torch_convert import convert_vae, load_torch_state_dict

    print(f"--> load a new VAE model from {path}")
    sd = load_torch_state_dict(path)
    prefix = "first_stage_model." if any(
        k.startswith("first_stage_model.") for k in sd
    ) else ""
    converted = {"vae": convert_vae(sd, prefix=prefix, strict=False)}
    params = _merge_params(params, converted)
    engine._wire_vae_embedders(params["vae"])
    return params


def gather_basemodels(args) -> List[str]:
    """Base-model sweep list (sampling_tv2v.py:182-199)."""
    assert not (args.basemodel_path and args.basemodel_listpath), (
        "Only one of basemodel_path and basemodel_listpath can be provided"
    )
    if args.basemodel_listpath:
        return [
            p.strip()
            for p in Path(args.basemodel_listpath).read_text().splitlines()
            if p.strip()
        ]
    if args.basemodel_path:
        return [args.basemodel_path]
    return ["default"]


def make_inpaint_mask(frames: np.ndarray, factor: int = 8) -> np.ndarray:
    """Latent-resolution inpainting mask from the hint video: generate (1)
    where the clip is pure white, keep (0) elsewhere — the mask recipe
    sketched in sampling_tv2v.py:385-407 (area-downsample xf, round, clamp).
    frames: (T,H,W,3) in [-1,1] (or raw uint8) -> (1,T,H/f,W/f,1)."""
    white = 255 if frames.dtype == np.uint8 else 1.0 - 1e-6
    px = (frames[..., 1] >= white).astype(np.float32)  # green channel
    t, h, w = px.shape
    f = factor
    pooled = px.reshape(t, h // f, f, w // f, f).mean(axis=(2, 4))  # area
    mask = np.clip(np.round(pooled), 0.0, 1.0)
    return mask[None, ..., None]


def _merge_params(init_tree, loaded_tree):
    """Overlay loaded weights onto the initialized tree (non-strict partial
    load with reporting, mirroring diffusion.py:130-137).  None leaves on
    either side are skipped: param-less embedders put None in the engine
    tree (conditioning/embedders.py), and a target-free orbax restore of a
    full saved tree returns those Nones back."""
    import flax

    flat_init = flax.traverse_util.flatten_dict(init_tree)
    flat_loaded = flax.traverse_util.flatten_dict(loaded_tree)
    merged = dict(flat_init)
    loaded, mismatched = 0, []
    for k, v in flat_loaded.items():
        if k in merged and v is not None and merged[k] is not None:
            if merged[k].shape == v.shape:
                merged[k] = jnp.asarray(v, dtype=merged[k].dtype)
                loaded += 1
            else:
                mismatched.append(("/".join(k), v.shape, merged[k].shape))
    missing = [k for k in flat_init if k not in flat_loaded]
    print(f"[ckpt] loaded {loaded}/{len(flat_init)} tensors; "
          f"{len(missing)} initialized fresh; {len(mismatched)} shape-mismatched")
    for m in mismatched[:10]:
        print("  mismatch:", m)
    return flax.traverse_util.unflatten_dict(merged)


def check_repeat(save_dir: Path, job_key: str, disable: bool) -> bool:
    """log_info.json resume ledger (sampling_tv2v.py:262-305)."""
    if disable:
        return False
    ledger = save_dir / "log_info.json"
    done = json.loads(ledger.read_text()) if ledger.exists() else {}
    return job_key in done


def mark_done(save_dir: Path, job_key: str, info: Dict):
    ledger = save_dir / "log_info.json"
    done = json.loads(ledger.read_text()) if ledger.exists() else {}
    done[job_key] = info
    ledger.write_text(json.dumps(done, indent=1))


def run_pipeline(args, reference_mode: bool = False):
    """The main CLI loop shared by tv2v and tvi2v: base-model sweep around a
    per-job sampling loop (sampling_tv2v.py:201-520)."""
    from ..utils.buckets import plan_geometry

    # Shape-bucketing compile policy (SURVEY §7.3 #5): snap the requested
    # geometry onto the supported grid so different-but-same-bucket requests
    # reuse one compiled program (a fresh SD-scale geometry is a 250-900 s
    # remote compile otherwise).  The clip is decoded straight to the bucket
    # size — replacing the resize the reference does anyway — and outputs
    # are restored to the requested geometry before saving.
    plan = plan_geometry(
        args.H, args.W, args.num_keyframes, args.sample_steps,
        enabled=not getattr(args, "exact_shapes", False),
    )
    if plan.changed:
        print(f"[buckets] {plan.describe()}; outputs restored to the "
              "requested geometry at save time")
    args.H, args.W = plan.h, plan.w
    args.num_keyframes, args.sample_steps = plan.t, plan.steps

    steps = args.sample_steps
    sdedit = args.sdedit_denoise_strength > 0
    if sdedit:
        assert args.sdedit_denoise_strength <= 1.0
        assert args.prior_coefficient_x == 0, (
            "prior_coefficient_x should be 0 when using sdedit_denoise_strength"
        )
    engine, cfg = load_engine(args, steps)
    jobs = gather_jobs(args)
    root_dir = Path(args.save_path)
    root_dir.mkdir(parents=True, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    base_params = None
    sample_jit = None
    decode_jit = None
    encode_jit = None

    # decoded-clip cache: BalanceCC-style job lists run several prompts over
    # the SAME video (and every base-model pass repeats the whole job list).
    # Reusing the decoded ndarray skips the mp4 decode AND — because the
    # annotator hint cache is keyed on array identity — the DPT depth forward
    # for repeat jobs.  Keyed on path+geometry+mtime; capacity-bounded.
    clip_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()

    def load_clip_cached(path: str) -> np.ndarray:
        # the requested number of REAL keyframes is decoded; the bucket plan
        # edge-pads up to the bucket clip length (center-aligned)
        key = (path, args.original_fps, args.target_fps, plan.req_t,
               args.H, args.W, os.path.getmtime(path))
        hit = clip_cache.get(key)
        if hit is None:
            hit = plan.pad_frames(load_video_keyframes(
                path, args.original_fps, args.target_fps,
                plan.req_t, (args.H, args.W), out_dtype="uint8",
            ))  # (T_bucket,H,W,3) uint8
            clip_cache[key] = hit
            while len(clip_cache) > 8:
                clip_cache.popitem(last=False)
        else:
            clip_cache.move_to_end(key)
        return hit

    for bm_idx, bm_path in enumerate(gather_basemodels(args)):
        print(f"-> base model {bm_idx}: {bm_path}")
        # per-base-model output subdir + ledger (sampling_tv2v.py:262-285)
        save_dir = root_dir if bm_path == "default" else root_dir / Path(bm_path).stem
        save_dir.mkdir(parents=True, exist_ok=True)
        params = None  # (re)built per base model below

        for job in jobs:
            vid_name = Path(job["video"]).stem
            job_key = f"{vid_name}::{job['prompt']}"
            if check_repeat(save_dir, job_key, args.disable_check_repeat):
                print(f"[skip] {job_key} already done")
                continue

            try:
                # uint8 end to end until the device edge: decoders emit uint8
                # natively and the upload ships 4x fewer bytes (PERF_r3 §16);
                # embedders/engine dequantize on device (as_float_frames)
                frames = load_clip_cached(job["video"])  # (T,H,W,3) uint8
            except Exception as e:  # per-job fault tolerance (:312-328)
                print(f"[error] {job_key}: failed to load video: {e}")
                continue
            video = frames[None]  # (1,T,H,W,3)
            prompt = ", ".join(x for x in (args.add_prompt, job["prompt"]) if x)

            batch = {"txt": [prompt], "control_hint": video}
            batch_uc = {"txt": [args.negative_prompt], "control_hint": video}
            if reference_mode:
                ref = load_image(job.get("reference", args.reference_path), (args.H, args.W))
                batch["cond_img"] = ref[None]
                batch_uc["cond_img"] = ref[None]

            if params is None:
                if base_params is None:
                    base_params = load_params(engine, args, batch)
                params = base_params
                if bm_path != "default":
                    params = apply_basemodel(engine, params, bm_path)
                if args.lora_path:
                    params = apply_lora(engine, params, args)
                if args.vae_path:
                    params = apply_vae(engine, params, args.vae_path)

            c, uc = engine.conditioner.get_unconditional_conditioning(
                params["conditioner"], batch, batch_uc
            )

            f = engine.latent_factor
            # batch samples per device call (sampling_tv2v.py batch_size):
            # num_samples are drawn in chunks of batch_size with the
            # conditioning repeated along the batch axis
            bs = max(1, min(args.batch_size, args.num_samples))
            z_shape = (bs, args.num_keyframes, args.H // f, args.W // f, 4)
            x_prior = None
            if args.prior_coefficient_x != 0 or sdedit or args.inpainting_mode:
                if encode_jit is None:
                    # ONE device execution per encode instead of ~200
                    # op-by-op RPC dispatches (measured: the un-jitted VAE
                    # encode added minutes per clip on the tunneled host;
                    # same reasoning as decode_jit / _hint_encode_jit)
                    encode_jit = jax.jit(
                        lambda p, x: engine.encode_first_stage(p, x))
                z_video = encode_jit(params, jnp.asarray(video))
                x_prior = z_video
                if (
                    reference_mode and not sdedit
                    and getattr(args, "prior_type", "video") in ("ref", "video_ref")
                ):
                    z_ref = encode_jit(params, jnp.asarray(batch["cond_img"]))
                    z_ref = jnp.repeat(z_ref[:, None], args.num_keyframes, axis=1)
                    x_prior = z_ref if args.prior_type == "ref" else 0.5 * (z_video + z_ref)

            inpaint_x0 = inpaint_mask = None
            if args.inpainting_mode:
                inpaint_x0 = x_prior if not sdedit else encode_jit(
                    params, jnp.asarray(video)
                )
                inpaint_mask = jnp.asarray(make_inpaint_mask(frames, f))

            if sample_jit is None:
                # jit once with params/conditioning as ARGUMENTS (closure
                # capture would bake the weights into the HLO as constants);
                # reused across samples and jobs of identical shape.  With a
                # segmented sampler the outer jit is skipped — the sampler
                # jits each chunk itself.
                use_prior = x_prior is not None
                use_inpaint = inpaint_x0 is not None
                # the prior-mix coefficients enter as traced scalar ARGUMENTS
                # (not baked constants): any nonzero coefficient value — a
                # user sweeping --prior_coefficient_x — reuses this one
                # compiled program instead of paying a fresh XLA compile
                mix_prior = use_prior and args.prior_coefficient_x != 0

                def _sample(p, cc, ucc, key, prior, ip_x0, ip_mask,
                            pc, pnc, gs):
                    return engine.sample(
                        p, cc, ucc, z_shape, key, num_steps=steps,
                        x_prior=prior if use_prior else None,
                        prior_coefficient=pc if mix_prior else 0.0,
                        prior_noise_coefficient=pnc if mix_prior else 1.0,
                        mode="sdedit" if sdedit else "full",
                        inpaint_x0=ip_x0 if use_inpaint else None,
                        inpaint_mask=ip_mask if use_inpaint else None,
                        guider_scale=gs,
                    )

                if getattr(engine.sampler, "segment_size", 0):
                    sample_jit = _sample
                else:
                    sample_jit = jax.jit(_sample)
                decode_jit = jax.jit(
                    # quantize to uint8 ON DEVICE: the device->host fetch of
                    # the decoded clip moves 4x fewer bytes than fp32 (the
                    # fetch, not the mp4 encode, dominates save time on
                    # RPC-tunneled hosts; save_video_frames accepts uint8)
                    lambda p, z: jnp.clip(
                        (engine.decode_first_stage(p, z) + 1.0) * 127.5,
                        0, 255).astype(jnp.uint8)
                )

            outputs = []
            t0 = time.time()
            zeros = jnp.zeros(z_shape)

            def rep(tree):
                return jax.tree_util.tree_map(
                    lambda v: jnp.repeat(v, bs, axis=0)
                    if hasattr(v, "ndim") and v.ndim > 0 and v.shape[0] == 1
                    else v, tree)

            c_b, uc_b = (rep(c), rep(uc)) if bs > 1 else (c, uc)
            prior_arg = rep(x_prior) if x_prior is not None else zeros
            ip_x0_arg = rep(inpaint_x0) if inpaint_x0 is not None else zeros
            ip_mask_arg = rep(inpaint_mask) if inpaint_mask is not None else zeros
            # weak-typed scalars (jnp.asarray of a python float): they
            # promote exactly like the python-float constants they replace
            # (weak f32 * bf16 stays bf16), so the lowered program is
            # identical to the baked-constant version except the value is
            # an argument
            pc_arg = jnp.asarray(float(args.prior_coefficient_x))
            pnc_arg = jnp.asarray(float(args.prior_coefficient_noise))
            gs_arg = jnp.asarray(float(args.cfg_scale))
            try:
                remaining = args.num_samples
                while remaining > 0:
                    rng, k = jax.random.split(rng)
                    latents = sample_jit(params, c_b, uc_b, k, prior_arg,
                                         ip_x0_arg, ip_mask_arg,
                                         pc_arg, pnc_arg, gs_arg)
                    decoded = np.asarray(decode_jit(params, latents))
                    take = min(bs, remaining)
                    outputs.extend(decoded[i] for i in range(take))
                    remaining -= take
            except Exception as e:  # per-job fault tolerance (:312-328)
                print(f"[error] {job_key}: sampling failed: {e}")
                continue
            dt = time.time() - t0

            ext = "." + args.save_type
            # bucket -> request restore: crop the T padding, resize to the
            # requested (H, W) — the same host-side step the reference's own
            # resize contract implies (scripts/sampling/util.py:705-746)
            for i, outp in enumerate(outputs):
                save_video_frames(
                    plan.restore_clip(outp),
                    str(save_dir / f"{vid_name}_{i:02d}{ext}"), fps=args.target_fps
                )
            save_video_frames(plan.restore_clip(frames),
                              str(save_dir / f"{vid_name}_original{ext}"),
                              fps=args.target_fps)
            hint = c.get("control_hint")
            if hint is not None and hint.ndim == 5:
                save_video_frames(plan.restore_clip(to_uint8(np.asarray(hint[0]))),
                                  str(save_dir / f"{vid_name}_hint{ext}"),
                                  fps=args.target_fps)
            mark_done(save_dir, job_key, {
                "prompt": job["prompt"], "seconds": dt, "num_samples": args.num_samples,
            })
            print(f"[done] {job_key}: {args.num_samples} sample(s) in {dt:.1f}s")
