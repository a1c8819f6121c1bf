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
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import build_engine, load_config
from ..data.video import load_image, load_video_keyframes, save_video_frames
from ..diffusion.guidance import VanillaCFG

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
            extra["segment_size"] = 16
    engine.sampler = make_sampler(
        SAMPLER_NAMES[args.sampler_name],
        discretization=make_discretization(
            "legacy_ddpm", **({"img2img_strength": strength} if strength else {})
        ),
        num_steps=num_steps,
        **extra,
    )
    return engine, cfg


def load_params(engine, args, example_batch) -> Dict:
    rng = jax.random.PRNGKey(args.seed)
    params = engine.init_params(rng, example_batch)
    if args.ckpt_path:
        from ..io.torch_convert import convert_sd_checkpoint, load_torch_state_dict

        sd = load_torch_state_dict(args.ckpt_path)
        net = engine.network
        converted = convert_sd_checkpoint(
            sd,
            video=net.unet.is_video,
            cfca=net.unet.enable_attention3d_crossframe,
            has_controlnet=net.controlnet is not None,
            has_controlnet_img=net.controlnet_img is not None,
            strict=False,
            channel_mult=tuple(net.unet.channel_mult),
            num_res_blocks=net.unet.num_res_blocks,
            attention_resolutions=tuple(net.unet.attention_resolutions),
            transformer_depth=net.unet.transformer_depth,
            model_channels=net.unet.model_channels,
            use_linear=net.unet.use_linear_in_transformer,
        )
        if args.lora_path:
            from ..io.lora import merge_kohya_lora

            converted = merge_kohya_lora(
                converted, load_torch_state_dict(args.lora_path), args.lora_strength
            )
        params = _merge_params(params, converted)
        engine._wire_vae_embedders(params["vae"])
    return params


def _merge_params(init_tree, loaded_tree):
    """Overlay loaded weights onto the initialized tree (non-strict partial
    load with reporting, mirroring diffusion.py:130-137)."""
    import flax

    flat_init = flax.traverse_util.flatten_dict(init_tree)
    flat_loaded = flax.traverse_util.flatten_dict(loaded_tree)
    merged = dict(flat_init)
    loaded, mismatched = 0, []
    for k, v in flat_loaded.items():
        if k in merged:
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
    """The main CLI loop shared by tv2v and tvi2v."""
    steps = args.sample_steps
    engine, cfg = load_engine(args, steps)
    jobs = gather_jobs(args)
    save_dir = Path(args.save_path)
    save_dir.mkdir(parents=True, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    params = None
    sample_jit = None
    decode_jit = None

    for job in jobs:
        vid_name = Path(job["video"]).stem
        job_key = f"{vid_name}::{job['prompt']}"
        if check_repeat(save_dir, job_key, args.disable_check_repeat):
            print(f"[skip] {job_key} already done")
            continue

        frames = load_video_keyframes(
            job["video"], args.original_fps, args.target_fps,
            args.num_keyframes, (args.H, args.W),
        )  # (T,H,W,3)
        video = frames[None]  # (1,T,H,W,3)
        prompt = ", ".join(x for x in (args.add_prompt, job["prompt"]) if x)

        batch = {"txt": [prompt], "control_hint": video}
        batch_uc = {"txt": [args.negative_prompt], "control_hint": video}
        if reference_mode:
            ref = load_image(job.get("reference", args.reference_path), (args.H, args.W))
            batch["cond_img"] = ref[None]
            batch_uc["cond_img"] = ref[None]

        if params is None:
            params = load_params(engine, args, batch)

        c, uc = engine.conditioner.get_unconditional_conditioning(
            params["conditioner"], batch, batch_uc
        )

        z_shape = (1, args.num_keyframes, args.H // 8, args.W // 8, 4)
        x_prior = None
        if args.prior_coefficient_x > 0 or args.sdedit_denoise_strength > 0:
            z_video = engine.encode_first_stage(params, jnp.asarray(video))
            x_prior = z_video
            if reference_mode and getattr(args, "prior_type", "video") in ("ref", "video_ref"):
                z_ref = engine.encode_first_stage(params, jnp.asarray(batch["cond_img"]))
                z_ref = jnp.repeat(z_ref[:, None], args.num_keyframes, axis=1)
                x_prior = z_ref if args.prior_type == "ref" else 0.5 * (z_video + z_ref)

        if sample_jit is None:
            # jit once with params/conditioning as ARGUMENTS (closure capture
            # would bake the weights into the HLO as constants); reused across
            # samples and jobs of identical shape.  With a segmented sampler
            # the outer jit is skipped — the sampler jits each chunk itself.
            use_prior = x_prior is not None

            def _sample(p, cc, ucc, key, prior):
                return engine.sample(
                    p, cc, ucc, z_shape, key, num_steps=steps,
                    x_prior=prior if use_prior else None,
                    prior_coefficient=args.prior_coefficient_x,
                )

            if getattr(engine.sampler, "segment_size", 0):
                sample_jit = _sample
            else:
                sample_jit = jax.jit(_sample)
            decode_jit = jax.jit(
                lambda p, z: engine.decode_first_stage(p, z)
            )

        outputs = []
        t0 = time.time()
        prior_arg = x_prior if x_prior is not None else jnp.zeros(z_shape)
        for s in range(args.num_samples):
            rng, k = jax.random.split(rng)
            latents = sample_jit(params, c, uc, k, prior_arg)
            decoded = decode_jit(params, latents)
            outputs.append(np.asarray(decoded[0]))
        dt = time.time() - t0

        ext = "." + args.save_type
        for i, outp in enumerate(outputs):
            save_video_frames(
                outp, str(save_dir / f"{vid_name}_{i:02d}{ext}"), fps=args.target_fps
            )
        save_video_frames(frames, str(save_dir / f"{vid_name}_original{ext}"),
                          fps=args.target_fps)
        hint = c.get("control_hint")
        if hint is not None and hint.ndim == 5:
            save_video_frames(np.asarray(hint[0]), str(save_dir / f"{vid_name}_hint{ext}"),
                              fps=args.target_fps)
        mark_done(save_dir, job_key, {
            "prompt": job["prompt"], "seconds": dt, "num_samples": args.num_samples,
        })
        print(f"[done] {job_key}: {args.num_samples} sample(s) in {dt:.1f}s")
