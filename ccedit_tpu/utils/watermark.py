"""Invisible watermark embedding for generated samples.

Behavioural parity target: ``WatermarkEmbedder``
(scripts/demo/streamlit_helpers.py:29-72): embeds the 'StableDiffusionV2'
bit pattern into every sample with imwatermark's dwtDct method, operating on
uint8 BGR frames.

The reference hard-depends on the ``imwatermark`` package (not in this
environment's dependency set).  We use it when importable; otherwise we fall
back to a self-contained blue-channel LSB embedding of the same 136-bit
message — detectable by ``decode_lsb``, clearly documented as NOT
dwtDct-compatible, and exercised by tests either way.
"""

from __future__ import annotations

import warnings

import numpy as np

# 'SDV2' watermark message used by the reference (streamlit_helpers.py:34-38)
WATERMARK_MESSAGE = 0b101100111110110010010000011110111011000110011110
WATERMARK_BITS = [int(bit) for bit in bin(WATERMARK_MESSAGE)[2:]]


class WatermarkEmbedder:
    def __init__(self, watermark=None):
        self.watermark = watermark or WATERMARK_BITS
        self.num_bits = len(self.watermark)
        self._encoder = None
        try:
            from imwatermark import WatermarkEncoder  # optional

            self._encoder = WatermarkEncoder()
            self._encoder.set_watermark("bits", self.watermark)
        except Exception:
            warnings.warn(
                "imwatermark unavailable: embedding watermark bits via "
                "blue-channel LSB fallback (not dwtDct-compatible)")

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (..., H, W, 3) float in [0, 1] RGB.  Returns same shape
        and dtype with the watermark embedded per frame."""
        shape = images.shape
        flat = np.round(np.clip(images, 0, 1).reshape((-1,) + shape[-3:])
                        * 255.0).astype(np.uint8)
        out = []
        for frame in flat:
            bgr = frame[:, :, ::-1].copy()
            if self._encoder is not None:
                bgr = self._encoder.encode(bgr, "dwtDct")
            else:
                bgr = self._embed_lsb(bgr)
            out.append(bgr[:, :, ::-1])
        return (np.stack(out).astype(np.float32) / 255.0).reshape(shape)

    def _embed_lsb(self, bgr: np.ndarray) -> np.ndarray:
        h, w = bgr.shape[:2]
        n = min(self.num_bits, h * w)
        blue = bgr[:, :, 0].reshape(-1)
        bits = np.asarray(self.watermark[:n], np.uint8)
        blue[:n] = (blue[:n] & 0xFE) | bits
        bgr[:, :, 0] = blue.reshape(h, w)
        return bgr


def decode_lsb(images: np.ndarray, num_bits: int = len(WATERMARK_BITS)):
    """Recover LSB-fallback watermark bits from an RGB float frame."""
    frame = np.round(np.clip(images.reshape((-1,) + images.shape[-3:])[0], 0, 1)
                     * 255.0).astype(np.uint8)
    blue = frame[:, :, 2].reshape(-1)  # RGB -> blue channel
    return list((blue[:num_bits] & 1).astype(int))


def embed_watermark(images: np.ndarray) -> np.ndarray:
    """Module-level helper mirroring streamlit_helpers.embed_watemark."""
    return WatermarkEmbedder()(images)
