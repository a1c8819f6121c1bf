"""Automatic reference-editing pipeline: centerframe -> edit -> TVI2V.

Parity target: the reference's three-command recipe (README.md:103-135):
  1. scripts/tools/extract_centerframe.py     — middle keyframe to png
  2. src/pnp-diffusers preprocess + pnp        — edit that frame with an
     image diffusion model (external plug-and-play repo)
  3. scripts/sampling/sampling_tv2v_ref.py     — video edit conditioned on
     the edited frame (prior_type ref)

Here the chain is ONE command.  Step 2 uses the in-repo img2img pipeline
(cli/sampling_image.py) as the frame editor — the pnp-diffusers dependency
is external to the reference too; any edited frame can alternatively be
supplied via --edited_frame to skip step 2 (e.g. edits made elsewhere).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _run(module_main, argv):
    old = sys.argv
    sys.argv = ["ccedit"] + argv
    try:
        module_main()
    finally:
        sys.argv = old


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--prompt", type=str, required=True,
                   help="edit prompt (drives both the frame edit and tvi2v)")
    p.add_argument("--config_path", type=str, required=True,
                   help="tvi2v (reference-conditioned) model config")
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--image_config_path", type=str, default="",
                   help="2D model config for the frame edit (default: reuse "
                        "--config_path's base model)")
    p.add_argument("--image_ckpt_path", type=str, default="")
    p.add_argument("--edited_frame", type=str, default="",
                   help="skip the img2img step and use this edited frame")
    p.add_argument("--save_path", type=str, default="outputs/auto_pipeline")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=768)
    p.add_argument("--original_fps", type=int, default=18)
    p.add_argument("--target_fps", type=int, default=6)
    p.add_argument("--num_keyframes", type=int, default=17)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=7.0)
    p.add_argument("--img2img_strength", type=float, default=0.75)
    p.add_argument("--prior_coefficient_x", type=float, default=0.03)
    p.add_argument("--prior_type", type=str, default="ref",
                   choices=["video", "ref", "video_ref"])
    p.add_argument("--seed", type=int, default=201574)
    p.add_argument("--add_prompt", type=str, default="masterpiece, best quality,")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--fake_annotator", action="store_true")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    save = Path(args.save_path)
    save.mkdir(parents=True, exist_ok=True)
    center_png = save / "centerframe.png"

    # 1. centerframe (README.md:111-118)
    from .extract_centerframe import main as centerframe_main

    _run(centerframe_main, [
        "--video_path", args.video_path, "--save_path", str(center_png),
        "--H", str(args.H), "--W", str(args.W),
        "--original_fps", str(args.original_fps),
        "--target_fps", str(args.target_fps),
        "--num_keyframes", str(args.num_keyframes),
    ])
    print(f"[auto] centerframe -> {center_png}")

    # 2. frame edit (pnp-diffusers stand-in: in-repo img2img)
    if args.edited_frame:
        edited = Path(args.edited_frame)
    else:
        from .sampling_image import main as image_main

        img_dir = save / "edited_frame"
        _run(image_main, [
            "--config_path", args.image_config_path or args.config_path,
            "--ckpt_path", args.image_ckpt_path or args.ckpt_path,
            "--prompt", args.prompt,
            "--negative_prompt", args.negative_prompt,
            "--init_image", str(center_png),
            "--img2img_strength", str(args.img2img_strength),
            "--H", str(args.H), "--W", str(args.W),
            "--sample_steps", str(args.sample_steps),
            "--cfg_scale", str(args.cfg_scale),
            "--save_path", str(img_dir), "--seed", str(args.seed),
        ] + (["--bf16"] if args.bf16 else [])
          + (["--fake_annotator"] if args.fake_annotator else []))
        edited = img_dir / "sample_000.png"
        print(f"[auto] edited frame -> {edited}")

    # 3. tvi2v with the edited reference (README.md:119-135)
    from .sampling_tv2v_ref import main as tvi2v_main

    _run(tvi2v_main, [
        "--seed", str(args.seed),
        "--config_path", args.config_path,
        "--ckpt_path", args.ckpt_path,
        "--H", str(args.H), "--W", str(args.W),
        "--original_fps", str(args.original_fps),
        "--target_fps", str(args.target_fps),
        "--num_keyframes", str(args.num_keyframes),
        "--sample_steps", str(args.sample_steps),
        "--sampler_name", "DPMPP2SAncestralSampler",
        "--cfg_scale", str(args.cfg_scale),
        "--prompt", args.prompt,
        "--add_prompt", args.add_prompt,
        "--negative_prompt", args.negative_prompt,
        "--video_path", args.video_path,
        "--reference_path", str(edited),
        "--save_path", str(save / "tvi2v"),
        "--disable_check_repeat",
        "--prior_coefficient_x", str(args.prior_coefficient_x),
        "--prior_type", args.prior_type,
    ] + (["--fake_annotator"] if args.fake_annotator else [])
      + (["--bf16"] if args.bf16 else []))
    print(f"[auto] done -> {save / 'tvi2v'}")


if __name__ == "__main__":
    main()
