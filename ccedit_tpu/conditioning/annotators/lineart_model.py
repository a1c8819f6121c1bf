"""Learned lineart detector (informative-drawings Generator), flax port.

Parity target: Generator/ResidualBlock (sgm/modules/diffusionmodules/util.py:
355-429, vendored from ControlNet-1.1) and the LineartDetector tensor path
(util.py:452-478): x in [-1,1] -> (x+1)/2 -> net -> *2-1, clip.

Architecture: ReflectionPad3+conv7 -> 2x strided down (InstanceNorm+ReLU) ->
9 residual blocks -> 2x transposed-conv up -> ReflectionPad3+conv7+sigmoid.
Weights load from the 'sk_model.pth' / 'sk_model2.pth' (coarse) checkpoints
via ccedit_tpu.io.torch_convert-style transforms (see convert_lineart below).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _inorm(name, dtype):
    """torch nn.InstanceNorm2d default: per-channel spatial stats, no affine."""
    return nn.GroupNorm(
        num_groups=None, group_size=1, epsilon=1e-5,
        use_bias=False, use_scale=False, dtype=dtype, name=name,
    )


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class LineartGenerator(nn.Module):
    in_ch: int = 3
    out_ch: int = 1
    n_residual_blocks: int = 3  # LineartDetector uses Generator(3, 1, 3)
    use_sigmoid: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # model0: reflection pad 3 + conv7 + IN + relu
        h = _reflect_pad(x, 3)
        h = nn.Conv(64, (7, 7), padding="VALID", dtype=self.dtype, name="m0_conv")(h)
        h = nn.relu(_inorm("m0_norm", self.dtype)(h))

        # model1: two stride-2 downs
        feats = 64
        for i in range(2):
            feats *= 2
            h = nn.Conv(feats, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"m1_conv{i}")(h)
            h = nn.relu(_inorm(f"m1_norm{i}", self.dtype)(h))

        # model2: residual blocks
        for i in range(self.n_residual_blocks):
            r = _reflect_pad(h, 1)
            r = nn.Conv(feats, (3, 3), padding="VALID", dtype=self.dtype,
                        name=f"m2_{i}_conv0")(r)
            r = nn.relu(_inorm(f"m2_{i}_norm0", self.dtype)(r))
            r = _reflect_pad(r, 1)
            r = nn.Conv(feats, (3, 3), padding="VALID", dtype=self.dtype,
                        name=f"m2_{i}_conv1")(r)
            r = _inorm(f"m2_{i}_norm1", self.dtype)(r)
            h = h + r

        # model3: two transposed-conv ups (torch ConvT k3 s2 p1 op1 == 2x)
        for i in range(2):
            feats //= 2
            h = nn.ConvTranspose(
                feats, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                transpose_kernel=True, dtype=self.dtype, name=f"m3_conv{i}",
            )(h)
            h = nn.relu(_inorm(f"m3_norm{i}", self.dtype)(h))

        # model4
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.out_ch, (7, 7), padding="VALID", dtype=self.dtype,
                    name="m4_conv")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


def detect_lineart(params, frames: jnp.ndarray, model: LineartGenerator) -> jnp.ndarray:
    """LineartDetector tensor path (util.py:466-478): frames (N,H,W,3) in
    [-1,1] -> lineart (N,H,W,1) in [-1,1]."""
    x = (frames + 1.0) / 2.0
    line = model.apply({"params": params}, x)
    return jnp.clip(line * 2.0 - 1.0, -1.0, 1.0)


def convert_lineart(sd: Dict[str, np.ndarray]) -> Dict:
    """sk_model.pth state dict -> flax tree.  torch Sequential indices:
    model0: [pad, conv(1), norm, relu];  model1: [conv(0), norm, relu]*2;
    model2: ResidualBlock.conv_block [pad, conv(1), norm, relu, pad, conv(5), norm];
    model3: [convT(0), norm, relu]*2;  model4: [pad, conv(1), (sigmoid)].
    InstanceNorm has no params (affine=False)."""
    from ...io.torch_convert import t_conv2d

    out: Dict[str, Dict] = {}

    def conv(src, dst):
        out[dst] = {"kernel": t_conv2d(sd[f"{src}.weight"]),
                    "bias": sd[f"{src}.bias"]}

    conv("model0.1", "m0_conv")
    conv("model1.0", "m1_conv0")
    conv("model1.3", "m1_conv1")
    n_res = len({k.split(".")[1] for k in sd if k.startswith("model2.")})
    for i in range(n_res):
        conv(f"model2.{i}.conv_block.1", f"m2_{i}_conv0")
        conv(f"model2.{i}.conv_block.5", f"m2_{i}_conv1")
    # ConvTranspose torch weight (in, out, kh, kw) -> flax transpose_kernel
    # expects (kh, kw, out, in)
    for i, t_idx in enumerate((0, 3)):
        w = sd[f"model3.{t_idx}.weight"]
        out[f"m3_conv{i}"] = {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": sd[f"model3.{t_idx}.bias"],
        }
    conv("model4.1", "m4_conv")
    return out
