"""NSFW / watermark filtering (DeepFloyd data-filtering port).

Behavioural parity target: ``DeepFloydDataFiltering``
(scripts/util/detection/nsfw_and_watermark_dectection.py:38-71): CLIP ViT-L/14
image features -> two logistic heads (p = nsfw, w = watermark) -> flagged
frames replaced by a heavy gaussian blur (kernel 99, sigma 100).

TPU-native pieces: the CLIP visual tower is modules.openclip's ViT with
quick-gelu (OpenAI CLIP); preprocessing is center-crop + bicubic-antialias
resize + CLIP normalization in jnp; the blur is a separable jnp convolution.
Heads load from the reference's ``w_head_v1.npz`` / ``p_head_v1.npz`` files;
the CLIP weights via ``convert_openclip_vision`` (an OpenAI ``clip`` visual
state_dict uses the same key layout).

Weights-gated: without head/backbone files the filter constructs but
``__call__`` passes images through unchanged with a one-time warning —
pipelines stay runnable offline while the detection structure is real.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def predict_proba(feats: np.ndarray, weights: np.ndarray,
                  biases: np.ndarray) -> np.ndarray:
    """Numerically-stable sigmoid head (detection file :11-17)."""
    logits = feats @ weights.T + biases
    return np.where(logits >= 0, 1.0 / (1.0 + np.exp(-logits)),
                    np.exp(logits) / (1.0 + np.exp(logits))).T


def clip_process_images(images: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) in [0,1] -> center-crop min side, 224 bicubic-antialias,
    CLIP-normalize (detection file :24-36)."""
    b, h, w, _ = images.shape
    side = min(h, w)
    top, left = (h - side) // 2, (w - side) // 2
    x = images[:, top:top + side, left:left + side, :]
    x = jax.image.resize(x, (b, 224, 224, 3), method="bicubic", antialias=True)
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], x.dtype)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], x.dtype)
    return (x - mean) / std


def gaussian_blur(images: jnp.ndarray, ksize: int = 99,
                  sigma: float = 100.0) -> jnp.ndarray:
    """Separable gaussian blur matching T.GaussianBlur(99, sigma=100)."""
    r = ksize // 2
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    kh = jnp.asarray(k).reshape(1, ksize, 1, 1)
    kv = jnp.asarray(k).reshape(ksize, 1, 1, 1)
    x = jnp.moveaxis(images, -1, 1).reshape(-1, images.shape[1],
                                            images.shape[2], 1)
    for kern in (kv, kh):
        x = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(images.shape[0], 3, images.shape[1], images.shape[2])
    return jnp.moveaxis(x, 1, -1)


class DeepFloydDataFiltering:
    """Filter frames: blur any frame whose nsfw (p) or watermark (w) head
    fires above 0.5 (detection file :53-70)."""

    def __init__(self, clip_params=None, p_head: Optional[tuple] = None,
                 w_head: Optional[tuple] = None, verbose: bool = False):
        self.verbose = verbose
        self.p_head = p_head  # (weights, biases)
        self.w_head = w_head
        self.clip_params = clip_params
        self._warned = False
        if clip_params is not None:
            from ..modules.openclip import OpenCLIPVisionModel

            # OpenAI CLIP ViT-L/14: width 1024, 24 layers, out 768, quick-gelu
            self.model = OpenCLIPVisionModel(
                patch_size=14, width=1024, heads=16, layers=24,
                output_dim=768, act="quick_gelu")
            self._encode = jax.jit(
                lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def from_files(cls, clip_ckpt: Optional[str] = None,
                   p_head_path: Optional[str] = None,
                   w_head_path: Optional[str] = None, verbose: bool = False):
        clip_params = None
        if clip_ckpt:
            from ..io.torch_convert import load_torch_state_dict
            from ..modules.openclip import convert_openclip_vision

            clip_params = convert_openclip_vision(
                load_torch_state_dict(clip_ckpt), layers=24)

        def heads(path):
            if not path:
                return None
            z = np.load(path)
            return z["weights"], z["biases"]

        return cls(clip_params, heads(p_head_path), heads(w_head_path),
                   verbose)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B,H,W,3) float in [0,1]."""
        if self.clip_params is None or (self.p_head is None
                                        and self.w_head is None):
            if not self._warned:
                warnings.warn(
                    "DeepFloydDataFiltering running as passthrough: supply "
                    "clip_ckpt + p/w head .npz files to enable filtering")
                self._warned = True
            return images
        feats = np.asarray(
            self._encode(self.clip_params, clip_process_images(images)),
            np.float16)
        flags = np.zeros(images.shape[0], bool)
        for head in (self.p_head, self.w_head):
            if head is not None:
                pred = predict_proba(feats, head[0], head[1]).reshape(-1)
                if self.verbose and (pred > 0.5).any():
                    print(f"safety filter hit: {pred}")
                flags |= pred > 0.5
        if not flags.any():
            return images
        blurred = gaussian_blur(images)
        mask = jnp.asarray(flags)[:, None, None, None]
        return jnp.where(mask, blurred, images)
