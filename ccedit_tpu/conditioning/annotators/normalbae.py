"""NormalBae surface-normal annotator (NNET) — TPU-native flax.

Behavioural parity target: ``NormalBaeEncoder``
(sgm/modules/encoders/modules.py:1465-1533) running the ``scannet.pt`` NNET
from "Estimating and Exploiting the Aleatoric Uncertainty in Surface Normal
Estimation" (baegwangbin/surface_normal_uncertainty, vendored by the
reference as src.controlnet11.annotator.normalbae): ImageNet-normalized
input -> EfficientNet-B5 encoder -> coarse-to-fine decoder that predicts
(normal xyz, kappa concentration) at 1/8 and refines the most UNCERTAIN
(lowest-kappa) pixels at 1/4, 1/2, 1/1 with per-pixel MLPs.

Encoder is the tf_efficientnet_b5 geometry (stem 48; stages
24/40/64/128/176/304/512 with repeats 3/5/5/7/7/9/3, kernels 3/3/5/3/5/5/3,
strides 1/2/2/2/1/2/1, expand 1/6x, SE 0.25-of-input, swish, BN eps 1e-3,
TF 'SAME' padding == XLA SAME).  Skip taps: stage0 (24ch, /2), stage1
(40, /4), stage2 (64, /8), stage4 (176, /16) and the 2048ch conv head (/32)
— the AdaBins/NNET feature indices.

TPU-first refinement: the reference's test-time point refinement picks the
top-(sampling_ratio · importance_ratio) most-uncertain pixels (its training
mode adds random points); here the count k is STATIC per resolution so the
top_k + gather + scatter pipeline jits cleanly.  The torch oracle in
tests/test_normalbae.py implements the identical algorithm, pinning both the
architecture and the weight conversion.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# tf_efficientnet_b5 stage spec: (out_ch, repeats, kernel, stride, expand)
B5_STAGES = [(24, 3, 3, 1, 1), (40, 5, 3, 2, 6), (64, 5, 5, 2, 6),
             (128, 7, 3, 2, 6), (176, 7, 5, 1, 6), (304, 9, 5, 2, 6),
             (512, 3, 3, 1, 6)]
B5_STEM = 48
B5_HEAD = 2048


class _BN(nn.Module):
    """Inference BatchNorm with stored running stats (eps 1e-3)."""

    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.ch,))
        var = self.param("var", nn.initializers.ones, (self.ch,))
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        return ((x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias).astype(
            x.dtype)


def _se(x, reduced: int, dtype, name_prefix: str, parent):
    """Squeeze-excite: global mean -> reduce conv -> swish -> expand -> gate."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = parent.child_conv(f"{name_prefix}_reduce", reduced)(s)
    s = nn.swish(s)
    s = parent.child_conv(f"{name_prefix}_expand", x.shape[-1])(s)
    return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    dtype: Dtype = jnp.float32

    def child_conv(self, name, ch, kernel=1, stride=1, groups=1):
        return nn.Conv(ch, (kernel, kernel), strides=(stride, stride),
                       padding="SAME", feature_group_count=groups,
                       use_bias=True if "se" in name else False,
                       dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        inp = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            x = self.child_conv("conv_pw", mid)(x)
            x = _BN(mid, dtype=self.dtype, name="bn1")(x)
            x = nn.swish(x)
        x = self.child_conv("conv_dw", mid, kernel=self.kernel,
                            stride=self.stride, groups=mid)(x)
        x = _BN(mid, dtype=self.dtype,
                name="bn2" if self.expand != 1 else "bn1")(x)
        x = nn.swish(x)
        x = _se(x, max(1, self.in_ch // 4), self.dtype, "se", self)
        x = self.child_conv("conv_pwl" if self.expand != 1 else "conv_pw",
                            self.out_ch)(x)
        x = _BN(self.out_ch, dtype=self.dtype,
                name="bn3" if self.expand != 1 else "bn2")(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inp
        return x


class EfficientNetB5Encoder(nn.Module):
    """Returns the NNET skip features: [s0(24,/2), s1(40,/4), s2(64,/8),
    s4(176,/16), head(2048,/32)] for the default B5 spec."""

    stem_ch: int = B5_STEM
    head_ch: int = B5_HEAD
    stages: Sequence[Tuple[int, int, int, int, int]] = tuple(B5_STAGES)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = _BN(self.stem_ch, dtype=self.dtype, name="bn1")(x)
        x = nn.swish(x)
        taps = []
        in_ch = self.stem_ch
        for si, (out_ch, reps, k, s, e) in enumerate(self.stages):
            for r in range(reps):
                x = MBConv(in_ch, out_ch, k, s if r == 0 else 1, e,
                           dtype=self.dtype, name=f"blocks_{si}_{r}")(x)
                in_ch = out_ch
            if si in (0, 1, 2, 4):
                taps.append(x)
        x = nn.Conv(self.head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        taps.append(x)  # pre-bn2 conv-head feature (AdaBins/NNET tap)
        return taps


class UpSampleBN(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        from .dpt_midas import resize_bilinear

        x = resize_bilinear(x, skip.shape[1:3], align_corners=True)
        x = jnp.concatenate([x, skip], axis=-1)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="convA")(x)
        x = _BN(self.out_ch, dtype=self.dtype, name="bnA")(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="convB")(x)
        x = _BN(self.out_ch, dtype=self.dtype, name="bnB")(x)
        return nn.leaky_relu(x, 0.01)


def norm_normalize(out: jnp.ndarray) -> jnp.ndarray:
    """(..., 4): unit-normalize xyz, kappa -> elu(kappa)+1.01 (NNET utils)."""
    xyz, kappa = out[..., :3], out[..., 3:]
    norm = jnp.sqrt(jnp.sum(jnp.square(xyz), axis=-1, keepdims=True) + 1e-10)
    kappa = nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([xyz / norm, kappa], axis=-1)


def _mlp_refine(parent, name: str, feat: jnp.ndarray, dtype) -> jnp.ndarray:
    """The reference's out_conv_res{4,2,1} per-point Conv1d MLP
    (128-128-128-4 with ReLU)."""
    h = feat
    for i, ch in enumerate((128, 128, 128)):
        h = nn.Dense(ch, dtype=dtype, name=f"{name}_fc{i}")(h)
        h = nn.relu(h)
    return nn.Dense(4, dtype=dtype, name=f"{name}_out")(h)


class NNET(nn.Module):
    """args: architecture 'BN', sampling_ratio 0.4, importance_ratio 0.7
    (modules.py:1476-1480)."""

    sampling_ratio: float = 0.4
    importance_ratio: float = 0.7
    stem_ch: int = B5_STEM
    head_ch: int = B5_HEAD
    stages: Sequence[Tuple[int, int, int, int, int]] = tuple(B5_STAGES)
    up_dims: Sequence[int] = (1024, 512, 256, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> List[jnp.ndarray]:
        """images: (B,H,W,3) ImageNet-normalized; H, W multiples of 32.
        Returns [out_res8, out_res4, out_res2, out_res1] (B,h,w,4) — the
        reference consumes the last one (modules.py:1516)."""
        from .dpt_midas import resize_bilinear

        s0, s1, s2, s4, head = EfficientNetB5Encoder(
            self.stem_ch, self.head_ch, self.stages, dtype=self.dtype,
            name="encoder")(images)
        x = nn.Conv(self.head_ch, (1, 1), dtype=self.dtype, name="conv2")(head)
        x = UpSampleBN(self.up_dims[0], dtype=self.dtype, name="up1")(x, s4)
        x_d2 = UpSampleBN(self.up_dims[1], dtype=self.dtype, name="up2")(x, s2)

        out_res8 = norm_normalize(
            nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv_res8")(x_d2))

        outs = [out_res8]
        prev = out_res8
        feats = {"res4": UpSampleBN(self.up_dims[2], dtype=self.dtype,
                                    name="up3")(x_d2, s1)}
        feats["res2"] = UpSampleBN(self.up_dims[3], dtype=self.dtype,
                                   name="up4")(feats["res4"], s0)
        # final full-res feature: reference upsamples res2 features by 2 at
        # the res1 stage via interpolation of the refinement inputs
        for stage, feat in (("res4", feats["res4"]), ("res2", feats["res2"]),
                            ("res1", feats["res2"])):
            b, fh, fw, fc = feat.shape
            if stage == "res1":
                fh, fw = fh * 2, fw * 2
                feat = resize_bilinear(feat, (fh, fw), align_corners=True)
            init = resize_bilinear(prev, (fh, fw), align_corners=True)
            init = norm_normalize(init)  # re-normalize after interpolation
            n_pix = fh * fw
            k = max(1, int(n_pix * self.sampling_ratio
                           * self.importance_ratio))
            uncertainty = -init[..., 3].reshape(b, n_pix)  # low kappa first
            _, idx = jax.lax.top_k(uncertainty, k)         # (B, k) static k
            flat_feat = jnp.concatenate(
                [feat, init], axis=-1).reshape(b, n_pix, fc + 4)
            sampled = jnp.take_along_axis(flat_feat, idx[..., None], axis=1)
            pred = _mlp_refine(self, f"out_conv_{stage}", sampled, self.dtype)
            pred = norm_normalize(pred)
            flat_init = init.reshape(b, n_pix, 4)
            refined = jax.vmap(lambda base, i, v: base.at[i].set(v))(
                flat_init, idx, pred)
            prev = refined.reshape(b, fh, fw, 4)
            outs.append(prev)
        return outs


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def detect_normalbae(params, frames01: jnp.ndarray,
                     model: Optional[NNET] = None) -> jnp.ndarray:
    """frames01: (N,H,W,3) in [0,1].  Returns normals (N,H,W,3) in [-1,1]
    with the reference's final mapping (negate + clamp, modules.py:1522-1524)."""
    model = model or NNET()
    x = (frames01 - IMAGENET_MEAN) / IMAGENET_STD
    n, h, w, _ = x.shape
    ph, pw = (-h) % 32, (-w) % 32
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    out = model.apply({"params": params}, x)[-1]
    normal = out[:, :h, :w, :3]
    return jnp.clip(-normal, -1.0, 1.0)


# ---------------------------------------------------------------------------
# weight conversion (scannet.pt geffnet/NNET layout -> flax)
# ---------------------------------------------------------------------------

def _conv_p(sd, k, bias=False):
    out = {"kernel": np.transpose(np.asarray(sd[f"{k}.weight"], np.float32),
                                  (2, 3, 1, 0))}
    if bias or f"{k}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    return out


def _dw_p(sd, k):
    """Depthwise conv: torch (C,1,kh,kw) -> flax (kh,kw,1,C)."""
    return {"kernel": np.transpose(np.asarray(sd[f"{k}.weight"], np.float32),
                                   (2, 3, 1, 0))}


def _bn_p(sd, k):
    return {"scale": np.asarray(sd[f"{k}.weight"], np.float32),
            "bias": np.asarray(sd[f"{k}.bias"], np.float32),
            "mean": np.asarray(sd[f"{k}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{k}.running_var"], np.float32)}


def convert_normalbae(sd: Dict[str, np.ndarray],
                      stages: Sequence = tuple(B5_STAGES)) -> Dict:
    """scannet.pt ('model.' prefixed NNET over geffnet b5) -> flax params."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    enc = "encoder.original_model."
    p: Dict = {"encoder": {
        "conv_stem": _conv_p(sd, enc + "conv_stem"),
        "bn1": _bn_p(sd, enc + "bn1"),
        "conv_head": _conv_p(sd, enc + "conv_head"),
    }}
    for si, (out_ch, reps, k, s, e) in enumerate(stages):
        for r in range(reps):
            src = f"{enc}blocks.{si}.{r}"
            blk: Dict = {
                "conv_dw": _dw_p(sd, f"{src}.conv_dw"),
                "se_reduce": _conv_p(sd, f"{src}.se.conv_reduce", bias=True),
                "se_expand": _conv_p(sd, f"{src}.se.conv_expand", bias=True),
            }
            if e != 1:
                blk["conv_pw"] = _conv_p(sd, f"{src}.conv_pw")
                blk["conv_pwl"] = _conv_p(sd, f"{src}.conv_pwl")
                blk["bn1"] = _bn_p(sd, f"{src}.bn1")
                blk["bn2"] = _bn_p(sd, f"{src}.bn2")
                blk["bn3"] = _bn_p(sd, f"{src}.bn3")
            else:
                blk["conv_pw"] = _conv_p(sd, f"{src}.conv_pw")
                blk["bn1"] = _bn_p(sd, f"{src}.bn1")
                blk["bn2"] = _bn_p(sd, f"{src}.bn2")
            p["encoder"][f"blocks_{si}_{r}"] = blk

    dec = "decoder."
    p["conv2"] = _conv_p(sd, dec + "conv2", bias=True)
    for name, tname in (("up1", "up1"), ("up2", "up2"), ("up3", "up3"),
                        ("up4", "up4")):
        p[name] = {
            "convA": _conv_p(sd, f"{dec}{tname}._net.0", bias=True),
            "bnA": _bn_p(sd, f"{dec}{tname}._net.1"),
            "convB": _conv_p(sd, f"{dec}{tname}._net.3", bias=True),
            "bnB": _bn_p(sd, f"{dec}{tname}._net.4"),
        }
    p["out_conv_res8"] = _conv_p(sd, dec + "out_conv_res8", bias=True)
    for stage in ("res4", "res2", "res1"):
        base = f"{dec}out_conv_{stage}"
        for i, j in enumerate((0, 2, 4)):
            w = np.asarray(sd[f"{base}.{j}.weight"], np.float32)  # (O,I,1)
            p[f"out_conv_{stage}_fc{i}"] = {
                "kernel": w[:, :, 0].T,
                "bias": np.asarray(sd[f"{base}.{j}.bias"], np.float32)}
        w = np.asarray(sd[f"{base}.6.weight"], np.float32)
        p[f"out_conv_{stage}_out"] = {
            "kernel": w[:, :, 0].T,
            "bias": np.asarray(sd[f"{base}.6.bias"], np.float32)}
    return p
