"""HED edge detector (ControlNetHED_Apache2), flax port.

Parity target: DoubleConvBlock / ControlNetHED_Apache2
(sgm/modules/encoders/modules.py:1536-1572): 5 VGG-style blocks, each
emitting a 1-channel projection at its scale; a learned per-channel input
shift ('norm').

The reference's ScribbleHEDEncoder forward is unfinished (pdb + raise at
modules.py:1604-1605); our forward follows ControlNet-1.1's HED usage: each
projection is bilinearly upsampled to input resolution, sigmoided, averaged,
then binarized/scribbled by the caller.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

_BLOCKS = ((3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3))


class HEDNetwork(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        """x: (N, H, W, 3) raw-scale input. Returns 5 projections."""
        shift = self.param("norm", nn.initializers.zeros, (1, 1, 1, 3))
        h = x - shift
        projections = []
        for bi, (cin, cout, layers) in enumerate(_BLOCKS):
            if bi > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for li in range(layers):
                h = nn.relu(
                    nn.Conv(cout, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"block{bi + 1}_conv{li}")(h)
                )
            projections.append(
                nn.Conv(1, (1, 1), dtype=self.dtype, name=f"block{bi + 1}_proj")(h)
            )
        return tuple(projections)


def detect_hed(params, frames: jnp.ndarray, model: HEDNetwork) -> jnp.ndarray:
    """frames (N,H,W,3) in [-1,1] -> soft edge map (N,H,W,1) in [0,1].
    ControlNet-1.1 semantics (and the recipe the reference's ScribbleHEDEncoder
    was building toward at modules.py:1604-1608): raw projections upsampled to
    full res, averaged, THEN sigmoid."""
    x255 = (frames + 1.0) * 127.5
    projs = model.apply({"params": params}, x255)
    n, h, w, _ = frames.shape
    ups = [
        jax.image.resize(p, (n, h, w, 1), method="bilinear") for p in projs
    ]
    return nn.sigmoid(jnp.mean(jnp.stack(ups), axis=0))


def convert_hed(sd: Dict[str, np.ndarray]) -> Dict:
    """ControlNetHED state dict (netNetwork.* or bare) -> flax tree."""
    from ...io.torch_convert import t_conv2d

    if any(k.startswith("netNetwork.") for k in sd):
        sd = {k[len("netNetwork."):]: v for k, v in sd.items() if k.startswith("netNetwork.")}
    out: Dict = {"norm": np.transpose(sd["norm"], (0, 2, 3, 1))}
    for bi, (_, _, layers) in enumerate(_BLOCKS):
        for li in range(layers):
            w = sd[f"block{bi + 1}.convs.{li}.weight"]
            b = sd[f"block{bi + 1}.convs.{li}.bias"]
            out[f"block{bi + 1}_conv{li}"] = {"kernel": t_conv2d(w), "bias": b}
        out[f"block{bi + 1}_proj"] = {
            "kernel": t_conv2d(sd[f"block{bi + 1}.projection.weight"]),
            "bias": sd[f"block{bi + 1}.projection.bias"],
        }
    return out
