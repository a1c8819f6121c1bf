"""Weight-free 'lineart_standard' annotator, pure jnp.

Reference: lineart_standard (encoders/modules.py:1213-1221) + LineartEncoder
standard path (:1240-1266):
  g = GaussianBlur(img255, sigma=6); intensity = min(g - img, channel axis)
  clipped to [0,255]; /= max(16, median(intensity[intensity>8])); *= 127;
  result inverted to [-1,1] and negated, 3-channel.

cv2's ksize for sigma=6 on uint8 is round(6*3)*2+1 = 37 (cv2.getGaussianKernel
convention); we use a 37-tap separable kernel.  The reference's pad-to-64 +
resize round trip is identity for the multiple-of-64 shapes CCEdit uses, so
it is elided.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _gaussian_kernel(sigma: float = 6.0, ksize: int = 37) -> np.ndarray:
    r = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(r**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable 2D blur with edge replication, x: (M, H, W, 1)."""
    k = jnp.asarray(kernel)
    pad = (len(kernel) - 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    kh = k.reshape(-1, 1, 1, 1)
    kw = k.reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn)
    return x


def lineart_standard_jnp(frames: jnp.ndarray) -> jnp.ndarray:
    """frames: (N, H, W, 3) in [-1, 1] -> (N, H, W, 3) lineart hint in [-1,1]."""
    x255 = (frames + 1.0) * 0.5 * 255.0
    kernel = _gaussian_kernel()
    # blur each channel
    n, h, w, c = x255.shape
    xch = x255.transpose(0, 3, 1, 2).reshape(n * c, h, w, 1)
    g = _blur(xch, kernel).reshape(n, c, h, w).transpose(0, 2, 3, 1)
    intensity = jnp.clip(jnp.min(g - x255, axis=-1), 0.0, 255.0)  # (N,H,W)

    # per-frame median of values > 8 (masked median via sorting with +inf fill)
    flat = intensity.reshape(n, -1)
    masked = jnp.where(flat > 8.0, flat, jnp.inf)
    cnt = jnp.sum(flat > 8.0, axis=1)
    svals = jnp.sort(masked, axis=1)
    mid = jnp.maximum((cnt - 1) // 2, 0)
    med = jnp.where(cnt > 0, svals[jnp.arange(n), mid], 0.0)
    denom = jnp.maximum(16.0, med)

    intensity = intensity / denom[:, None, None] * 127.0
    result = jnp.clip(intensity, 0.0, 255.0)
    out = result / 255.0 * 2.0 - 1.0
    out = -out  # LineartEncoder negates (modules.py:1252)
    return jnp.repeat(out[..., None], 3, axis=-1)
