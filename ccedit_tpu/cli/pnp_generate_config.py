"""Emit a pnp-diffusers YAML for the automatic center-frame editing pipeline.

Parity target: scripts/sampling/pnp_generate_config.py (also duplicated in
scripts/tools/) — writes the config consumed by the external pnp-diffusers
preprocess/pnp stages of the auto pipeline (README.md:103-135).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", type=str, required=True, help="center keyframe png")
    p.add_argument("--prompt", type=str, required=True, help="edit prompt")
    p.add_argument("--save_path", type=str, required=True, help="output yaml path")
    p.add_argument("--output_dir", type=str, default="outputs/pnp")
    p.add_argument("--latents_path", type=str, default="latents")
    p.add_argument("--negative_prompt", type=str,
                   default="ugly, blurry, low res, unrealistic")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--pnp_attn_t", type=float, default=0.5)
    p.add_argument("--pnp_f_t", type=float, default=0.8)
    args = p.parse_args()

    cfg = {
        "seed": 1,
        "device": "cuda",
        "output_path": args.output_dir,
        "image_path": args.image_path,
        "latents_path": args.latents_path,
        "sd_version": "1.5",
        "guidance_scale": args.guidance_scale,
        "n_timesteps": args.steps,
        "prompt": args.prompt,
        "negative_prompt": args.negative_prompt,
        "pnp_attn_t": args.pnp_attn_t,
        "pnp_f_t": args.pnp_f_t,
    }
    out = Path(args.save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(yaml.safe_dump(cfg))
    print(f"wrote pnp config to {out}")


if __name__ == "__main__":
    main()
