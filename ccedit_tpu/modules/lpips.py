"""LPIPS perceptual metric (VGG16 backbone), from scratch in flax.

Behavioural parity target: ``taming.modules.losses.lpips.LPIPS`` as used by
the reference's VAE losses (sgm/modules/autoencoding/losses/__init__.py:7,
33,114) and the 'lpips' diffusion loss type (sgm/modules/diffusionmodules/
loss.py:51-53):

  input pair in [-1,1] -> ScalingLayer (shift/scale constants) -> VGG16
  features at relu{1_2, 2_2, 3_3, 4_3, 5_3} -> unit-normalize channels ->
  squared diff -> learned 1x1 reduction (NetLinLayer) -> spatial mean ->
  sum over the five taps.  Output shape (N, 1, 1, 1)-equivalent (N,1,1,1 in
  NHWC here: (N,1,1,1)).

Weights: ``convert_lpips`` accepts the taming ``vgg.pth`` state_dict (net.*
slices + lin{0-4}.model.1.weight); torchvision VGG16 state_dicts convert via
``convert_vgg16_features``.  Offline, ``LPIPS`` still initializes (random) so
the loss plumbs end-to-end; parity is pinned with random converted weights in
tests/test_vae_training.py.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any

# VGG16 conv plan: (out_channels, pool_before)
_VGG16 = [(64, False), (64, False),
          (128, True), (128, False),
          (256, True), (256, False), (256, False),
          (512, True), (512, False), (512, False),
          (512, True), (512, False), (512, False)]
# taps AFTER the relu of these conv indices (0-based): relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3
_TAPS = [1, 3, 6, 9, 12]
_TAP_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for i, (ch, pool) in enumerate(_VGG16):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                name=f"conv_{i}")(x))
            if i in _TAPS:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Call with two (N,H,W,3) images in [-1,1]; returns (N,1,1,1)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in0, in1):
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        net = VGG16Features(dtype=self.dtype, name="net")
        f0 = net((in0 - shift) / scale)
        f1 = net((in1 - shift) / scale)
        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(jnp.sum(jnp.square(a), -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(jnp.square(b), -1, keepdims=True) + 1e-10)
            d = jnp.square(a - b)
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin_{k}")(d)
            total = total + jnp.mean(lin, axis=(1, 2), keepdims=True)
        return total


def convert_vgg16_features(sd: Dict[str, np.ndarray],
                           prefix: str = "features.") -> Dict:
    """torchvision-style VGG16 ``features.N.weight/bias`` -> flax tree."""
    # torchvision indices of the 13 convs inside features
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, t in enumerate(tv_idx):
        out[f"conv_{i}"] = {
            "kernel": np.transpose(
                np.asarray(sd[f"{prefix}{t}.weight"], np.float32), (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{prefix}{t}.bias"], np.float32),
        }
    return out


def convert_lpips(sd: Dict[str, np.ndarray]) -> Dict:
    """taming ``vgg.pth`` LPIPS state_dict -> flax params:
    net.slice{1-5}.{j}.weight/bias (torch features indices) + lin{k}.model.1
    1x1 reductions."""
    feats = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}
    # taming stores the torchvision indices inside slices; normalize either
    # layout by matching the global conv ordering on sorted (slice, idx)
    if any(k.startswith("slice") for k in feats):
        flat = {}
        for k, v in feats.items():  # e.g. slice3.11.weight
            _, idx, leaf = k.split(".")
            flat[f"features.{idx}.{leaf}"] = v
        feats = flat
    params = {"net": convert_vgg16_features(feats, prefix="features.")}
    for k in range(5):
        w = sd.get(f"lin{k}.model.1.weight", sd.get(f"lins.{k}.model.1.weight"))
        params[f"lin_{k}"] = {
            "kernel": np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))}
    return params
