"""PiDiNet (pixel-difference network) edge detector — TPU-native.

Reference behavior: `SoftEdgeEncoder` / `ScribblePidiNetEncoder`
(sgm/modules/encoders/modules.py:1405-1446, 1655-1708) run the external
`table5_pidinet` model (hellozhuo/pidinet, imported there as
``src.controlnet11.annotator.pidinet``) and use the last (fused) sigmoid map.

The public architecture is ``pidinet()`` = PiDiNet(60, carv4, dil=24, sa=True):
four stages of pixel-difference-conv (PDC) blocks with CDCM dilation fusion,
CSAM spatial attention, per-stage 1-channel maps upsampled to input size, and
a 1x1 classifier over the 4 maps; all five outputs pass through sigmoid.

TPU-first design: PDC ops (central/angular/radial difference convolutions)
are LINEAR in the weights, so we fold them into ordinary conv kernels once at
weight-load time (the same algebra as pidinet's own ``convert_pidinet``
"converted" checkpoints):

  * cd: W'[center] -= sum(W)               (3x3)
  * ad: W' = W - rot_clockwise(W)          (3x3)
  * rd: 3x3 ring scattered +outer/-inner into a 5x5 kernel (pad 2)

Inference is then a vanilla channels-last CNN — XLA tiles every conv onto the
MXU with no gather/scatter in the hot path.  The torch-parity test runs the
*runtime* PDC ops as the oracle, so both the architecture and the conversion
algebra are pinned (tests/test_annotator_parity.py).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# carv4 PDC layout (pidinet config): 4 stages x [cd, ad, rd, cv]
CARV4 = ["cd", "ad", "rd", "cv"] * 4

# clockwise rotation of a flattened 3x3 kernel, used by the 'ad' op
_AD_ROT = [3, 0, 1, 6, 4, 2, 7, 8, 5]
# 5x5 flat positions of the outer ring / inner (3x3 minus center) ring
_RD_OUTER = [0, 2, 4, 10, 14, 20, 22, 24]
_RD_INNER = [6, 7, 8, 11, 13, 16, 17, 18]


def convert_pdc_weight(op: str, w: np.ndarray) -> np.ndarray:
    """Fold a PDC op into a plain conv kernel.  w: torch layout (O, I, 3, 3).
    Returns (O, I, 3, 3) for cd/ad/cv or (O, I, 5, 5) for rd."""
    w = np.asarray(w, dtype=np.float32)
    o, i = w.shape[:2]
    if op == "cv":
        return w
    if op == "cd":
        out = w.copy().reshape(o, i, 9)
        out[:, :, 4] -= w.sum(axis=(2, 3))
        return out.reshape(o, i, 3, 3)
    if op == "ad":
        flat = w.reshape(o, i, 9)
        return (flat - flat[:, :, _AD_ROT]).reshape(o, i, 3, 3)
    if op == "rd":
        flat = w.reshape(o, i, 9)
        buf = np.zeros((o, i, 25), dtype=np.float32)
        buf[:, :, _RD_OUTER] = flat[:, :, 1:]
        buf[:, :, _RD_INNER] = -flat[:, :, 1:]
        return buf.reshape(o, i, 5, 5)
    raise ValueError(f"unknown pdc op {op!r}")


class PDCBlockConverted(nn.Module):
    """Depthwise (converted-PDC) 3x3/5x5 conv -> relu -> 1x1, residual; the
    stride-2 variant max-pools and projects the shortcut."""

    out_ch: int
    kernel: int  # 3 or 5 (rd)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.stride > 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        k = self.kernel
        y = nn.Conv(in_ch, (k, k), padding=k // 2, feature_group_count=in_ch,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv2")(y)
        if self.stride > 1:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return y + x


class CDCM(nn.Module):
    """Compact dilation conv module: 1x1 reduce + sum of 4 dilated 3x3."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), name="conv1")(x)
        y = 0.0
        for i, d in enumerate((5, 7, 9, 11)):
            y = y + nn.Conv(self.out_ch, (3, 3), padding=d, kernel_dilation=d,
                            use_bias=False, name=f"conv2_{i + 1}")(x)
        return y


class CSAM(nn.Module):
    """Compact spatial attention: relu -> 1x1 -> 3x3 -> sigmoid gate."""

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(4, (1, 1), name="conv1")(y)
        y = nn.Conv(1, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        return x * nn.sigmoid(y)


def _bilinear_resize(x, hw):
    from .dpt_midas import resize_bilinear

    return resize_bilinear(x, hw, align_corners=False)


class PiDiNet(nn.Module):
    """table5_pidinet: inplane 60, carv4, dil 24, sa.  Input (N,H,W,3) BGR in
    [0,1]; returns 5 sigmoid edge maps (N,H,W,1), last = fused classifier."""

    inplane: int = 60
    dil: int = 24
    pdcs: Sequence[str] = tuple(CARV4)

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        k0 = 5 if self.pdcs[0] == "rd" else 3
        x = nn.Conv(self.inplane, (k0, k0), padding=k0 // 2,
                    use_bias=False, name="init_block")(x)

        def kfor(i):
            return 5 if self.pdcs[i] == "rd" else 3

        c = self.inplane
        x1 = PDCBlockConverted(c, kfor(1), name="block1_1")(x)
        x1 = PDCBlockConverted(c, kfor(2), name="block1_2")(x1)
        x1 = PDCBlockConverted(c, kfor(3), name="block1_3")(x1)

        x2 = PDCBlockConverted(2 * c, kfor(4), stride=2, name="block2_1")(x1)
        x2 = PDCBlockConverted(2 * c, kfor(5), name="block2_2")(x2)
        x2 = PDCBlockConverted(2 * c, kfor(6), name="block2_3")(x2)
        x2 = PDCBlockConverted(2 * c, kfor(7), name="block2_4")(x2)

        x3 = PDCBlockConverted(4 * c, kfor(8), stride=2, name="block3_1")(x2)
        x3 = PDCBlockConverted(4 * c, kfor(9), name="block3_2")(x3)
        x3 = PDCBlockConverted(4 * c, kfor(10), name="block3_3")(x3)
        x3 = PDCBlockConverted(4 * c, kfor(11), name="block3_4")(x3)

        x4 = PDCBlockConverted(4 * c, kfor(12), stride=2, name="block4_1")(x3)
        x4 = PDCBlockConverted(4 * c, kfor(13), name="block4_2")(x4)
        x4 = PDCBlockConverted(4 * c, kfor(14), name="block4_3")(x4)
        x4 = PDCBlockConverted(4 * c, kfor(15), name="block4_4")(x4)

        edges = []
        for i, xi in enumerate((x1, x2, x3, x4)):
            y = CDCM(self.dil, name=f"dilations_{i}")(xi)
            y = CSAM(name=f"attentions_{i}")(y)
            y = nn.Conv(1, (1, 1), name=f"conv_reduces_{i}")(y)
            edges.append(_bilinear_resize(y, (h, w)))
        fused = nn.Conv(1, (1, 1), name="classifier")(
            jnp.concatenate(edges, axis=-1))
        return [nn.sigmoid(e) for e in edges] + [nn.sigmoid(fused)]


# ---------------------------------------------------------------------------
# weight conversion (torch state_dict -> flax params)
# ---------------------------------------------------------------------------

def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def convert_pidinet(sd: Dict[str, np.ndarray],
                    pdcs: Sequence[str] = tuple(CARV4)) -> Dict:
    """Convert the ``table5_pidinet.pth`` state_dict (keys already stripped of
    the ``module.`` prefix, as in modules.py:1413) into flax params, folding
    every PDC op into a plain kernel."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params: Dict = {}

    def put(name, **leaves):
        params[name] = {k: jnp.asarray(v) for k, v in leaves.items()}

    put("init_block",
        kernel=_oihw_to_hwio(convert_pdc_weight(pdcs[0], sd["init_block.weight"])))

    names = (["block1_1", "block1_2", "block1_3"]
             + [f"block2_{i}" for i in range(1, 5)]
             + [f"block3_{i}" for i in range(1, 5)]
             + [f"block4_{i}" for i in range(1, 5)])
    for idx, name in enumerate(names):
        op = pdcs[idx + 1]
        block = {
            "conv1": {"kernel": jnp.asarray(_oihw_to_hwio(
                convert_pdc_weight(op, sd[f"{name}.conv1.weight"])))},
            "conv2": {"kernel": jnp.asarray(_oihw_to_hwio(sd[f"{name}.conv2.weight"]))},
        }
        if f"{name}.shortcut.weight" in sd:
            block["shortcut"] = {
                "kernel": jnp.asarray(_oihw_to_hwio(sd[f"{name}.shortcut.weight"])),
                "bias": jnp.asarray(sd[f"{name}.shortcut.bias"]),
            }
        params[name] = block

    for i in range(4):
        params[f"dilations_{i}"] = {
            "conv1": {"kernel": jnp.asarray(_oihw_to_hwio(sd[f"dilations.{i}.conv1.weight"])),
                      "bias": jnp.asarray(sd[f"dilations.{i}.conv1.bias"])},
            **{f"conv2_{j}": {"kernel": jnp.asarray(_oihw_to_hwio(
                sd[f"dilations.{i}.conv2_{j}.weight"]))} for j in range(1, 5)},
        }
        params[f"attentions_{i}"] = {
            "conv1": {"kernel": jnp.asarray(_oihw_to_hwio(sd[f"attentions.{i}.conv1.weight"])),
                      "bias": jnp.asarray(sd[f"attentions.{i}.conv1.bias"])},
            "conv2": {"kernel": jnp.asarray(_oihw_to_hwio(sd[f"attentions.{i}.conv2.weight"]))},
        }
        params[f"conv_reduces_{i}"] = {
            "kernel": jnp.asarray(_oihw_to_hwio(sd[f"conv_reduces.{i}.conv.weight"])),
            "bias": jnp.asarray(sd[f"conv_reduces.{i}.conv.bias"]),
        }
    params["classifier"] = {
        "kernel": jnp.asarray(_oihw_to_hwio(sd["classifier.weight"])),
        "bias": jnp.asarray(sd["classifier.bias"]),
    }
    return params


def detect_pidinet(params, frames_bgr01: jnp.ndarray,
                   model: PiDiNet | None = None) -> jnp.ndarray:
    """frames_bgr01: (N,H,W,3) BGR in [0,1] (the encoder flips RGB->BGR as in
    modules.py:1428).  Returns the fused sigmoid edge map (N,H,W,1)."""
    model = model or PiDiNet()
    return model.apply({"params": params}, frames_bgr01)[-1]


def safe_step(x: jnp.ndarray, step: int = 2) -> jnp.ndarray:
    """Quantize to `step` levels (controlnet11 annotator/util.py safe_step)."""
    y = x.astype(jnp.float32) * float(step + 1)
    y = jnp.floor(y).astype(jnp.int32).astype(jnp.float32) / float(step)
    return y
