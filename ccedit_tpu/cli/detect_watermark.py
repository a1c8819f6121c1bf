"""Watermark detector CLI.

Parity target: scripts/demo/detect.py — check images for the SDV2 invisible
watermark.  Uses imwatermark's dwtDct decoder when available; otherwise the
blue-channel LSB decoder matching this repo's fallback embedder
(utils/watermark.py).
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image

from ..utils.watermark import WATERMARK_BITS, decode_lsb


def bits_match_fraction(bits) -> float:
    ref = np.asarray(WATERMARK_BITS)
    got = np.asarray(bits[: len(ref)])
    if len(got) < len(ref):
        return 0.0
    return float((ref == got).mean())


def detect(path: str, threshold: float = 0.9) -> bool:
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    try:
        from imwatermark import WatermarkDecoder

        dec = WatermarkDecoder("bits", len(WATERMARK_BITS))
        bits = dec.decode(
            (img[:, :, ::-1] * 255).astype(np.uint8), "dwtDct")
        return bits_match_fraction([int(b) for b in bits]) >= threshold
    except Exception:
        return bits_match_fraction(decode_lsb(img[None])) >= threshold


def main():
    p = argparse.ArgumentParser()
    p.add_argument("images", nargs="+")
    p.add_argument("--threshold", type=float, default=0.9)
    args = p.parse_args()
    for path in args.images:
        found = detect(path, args.threshold)
        print(f"{path}: {'WATERMARKED' if found else 'clean'}")


if __name__ == "__main__":
    main()
