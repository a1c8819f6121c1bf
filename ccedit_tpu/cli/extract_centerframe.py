"""Extract the center keyframe of a clip to a png for external editing.

Parity target: scripts/tools/extract_centerframe.py:39-60 — selects the same
keyframes the TV2V sampler will use and saves the middle one.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

from ..data.video import load_video_keyframes, to_uint8


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=768)
    p.add_argument("--original_fps", type=int, default=20)
    p.add_argument("--target_fps", type=int, default=6)
    p.add_argument("--num_keyframes", type=int, default=17)
    args = p.parse_args()

    frames = load_video_keyframes(
        args.video_path, args.original_fps, args.target_fps,
        args.num_keyframes, (args.H, args.W),
    )
    center = to_uint8(frames[args.num_keyframes // 2])
    out = Path(args.save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(center).save(out)
    print(f"saved center keyframe ({args.num_keyframes // 2}) to {out}")


if __name__ == "__main__":
    main()
