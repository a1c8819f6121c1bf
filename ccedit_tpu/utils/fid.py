"""Frechet Inception Distance over the in-repo InceptionV3 backbone.

The reference wraps ``pytorch_fid.inception`` (encoders/modules.py:207-230)
for evaluation; this module supplies the matching metric math so BalanceCC-
style sweeps (BASELINE.md) can be scored end-to-end in-framework:

  activations : batched 2048-d pool features from modules.inception
  fid         : ||mu1-mu2||^2 + tr(S1 + S2 - 2 sqrt(S1 S2))

The matrix square root runs on host (scipy on the small 2048x2048 Gram
matrix), matching pytorch_fid's calculate_frechet_distance semantics
including the eps-regularized retry for near-singular covariances.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def activations(params, images: Iterable[np.ndarray], batch_size: int = 16,
                model=None) -> np.ndarray:
    """images: iterable of (H,W,3) float arrays in [0,1].  Returns (N,2048)."""
    from ..modules.inception import InceptionV3

    model = model or InceptionV3(resize_input=True, normalize_input=True)
    apply_fn = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
    feats = []
    batch = []
    for img in images:
        batch.append(np.asarray(img, np.float32))
        if len(batch) == batch_size:
            feats.append(np.asarray(apply_fn(params, jnp.asarray(np.stack(batch)))))
            batch = []
    if batch:
        feats.append(np.asarray(apply_fn(params, jnp.asarray(np.stack(batch)))))
    return np.concatenate(feats, axis=0)


def statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """pytorch_fid calculate_frechet_distance semantics."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("non-negligible imaginary component in sqrtm")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid(params, images_a, images_b, batch_size: int = 16,
        model=None) -> float:
    fa = activations(params, images_a, batch_size, model)
    fb = activations(params, images_b, batch_size, model)
    return frechet_distance(*statistics(fa), *statistics(fb))
