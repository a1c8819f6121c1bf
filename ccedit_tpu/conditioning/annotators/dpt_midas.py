"""MiDaS DPT-Hybrid relative-depth backbone, flax/TPU implementation.

Parity target: the `dpt_hybrid` MiDaS model used by DepthMidasEncoder
(sgm/modules/encoders/modules.py:1346-1392 — the production structure hint of
the shipped tv2v pipeline).  The reference imports the network from the
external ControlNet-1.1 clone (not vendored); this is a from-scratch
channels-last implementation of the public DPT-Hybrid architecture:

  * BiT (ResNetV2) stem + 3 bottleneck stages with weight-standardized convs
    and GroupNorm (taps at stage1 /4 and stage2 /8),
  * ViT-B/16 trunk on the /16 feature map (cls token, resized position
    embeddings, taps after blocks 8 and 11, no final LayerNorm on taps),
  * DPT neck: per-tap "project" readout, reassemble convs, RefineNet-style
    feature fusion with align_corners=True 2x upsampling,
  * monotonic ReLU depth head.

Input: (N, H, W, 3) in [-1, 1] (the ControlNet/CCEdit convention — images
scaled by 1/127.5 - 1, no ImageNet normalization), H and W divisible by 32.
Output: (N, H, W) relative inverse depth (bigger = closer).

Weight conversion accepts both the official MiDaS checkpoint naming
(`dpt_hybrid-midas-501f0c75.pt`: pretrained.model.* / scratch.*) and the
HuggingFace `Intel/dpt-hybrid-midas` naming (dpt.* / neck.* / head.*), which
is also what the torch-parity tests build against.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


# ---------------------------------------------------------------------------
# exact torch-compatible bilinear resize (einsum with precomputed matrices)
# ---------------------------------------------------------------------------

def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out,in) bilinear interpolation weights matching F.interpolate."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        pos = np.linspace(0.0, in_size - 1.0, out_size)
    else:
        pos = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        pos = np.clip(pos, 0.0, in_size - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H2,W2,C); static shapes so the matrices are trace-time
    constants and the two contractions land on the MXU."""
    h, w = x.shape[1], x.shape[2]
    h2, w2 = out_hw
    if (h, w) == (h2, w2):
        return x
    ah = jnp.asarray(_interp_matrix(h, h2, align_corners), dtype=x.dtype)
    aw = jnp.asarray(_interp_matrix(w, w2, align_corners), dtype=x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", ah, x)
    return jnp.einsum("pw,nowc->nopc", aw, x)


# ---------------------------------------------------------------------------
# BiT (ResNetV2, non-preactivation bottlenecks) building blocks
# ---------------------------------------------------------------------------

class WSConv(nn.Module):
    """Weight-standardized conv (BiT): kernel normalized per output channel
    over (kh, kw, in) with biased variance, eps 1e-8, TF-SAME padding."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel + (in_ch, self.features),
        )
        k32 = k.astype(jnp.float32)
        mean = k32.mean(axis=(0, 1, 2), keepdims=True)
        var = k32.var(axis=(0, 1, 2), keepdims=True)
        k = ((k32 - mean) / jnp.sqrt(var + self.eps)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, self.stride, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class GNAct(nn.Module):
    num_groups: int = 32
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="gn")(x)
        return nn.relu(y) if self.act else y


class BitBottleneck(nn.Module):
    """Non-preact ResNetV2 bottleneck (conv1x1-GN-relu, conv3x3-GN-relu,
    conv1x1-GN; 1x1+GN downsample shortcut on the first block; relu(sum))."""

    out_ch: int
    mid_ch: int
    stride: int = 1
    has_down: bool = False
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.has_down:
            shortcut = WSConv(self.out_ch, (1, 1), (self.stride, self.stride),
                              dtype=self.dtype, name="down_conv")(x)
            shortcut = GNAct(self.num_groups, act=False, dtype=self.dtype,
                             name="down_norm")(shortcut)
        h = WSConv(self.mid_ch, (1, 1), dtype=self.dtype, name="conv1")(x)
        h = GNAct(self.num_groups, dtype=self.dtype, name="norm1")(h)
        h = WSConv(self.mid_ch, (3, 3), (self.stride, self.stride),
                   dtype=self.dtype, name="conv2")(h)
        h = GNAct(self.num_groups, dtype=self.dtype, name="norm2")(h)
        h = WSConv(self.out_ch, (1, 1), dtype=self.dtype, name="conv3")(h)
        h = GNAct(self.num_groups, act=False, dtype=self.dtype, name="norm3")(h)
        return nn.relu(h + shortcut)


def _make_div(v: float, divisor: int = 8) -> int:
    out = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if out < 0.9 * v:
        out += divisor
    return out


# ---------------------------------------------------------------------------
# ViT trunk pieces
# ---------------------------------------------------------------------------

class ViTBlock(nn.Module):
    """Pre-LN ViT block with fused-qkv layout (matches the MiDaS/timm
    parameterization; HF's split q/k/v is fused by the converter)."""

    hidden: int
    heads: int
    mlp_dim: int
    ln_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        n, l, d = tokens.shape
        hd = d // self.heads
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(tokens)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(n, l, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(n, l, d)
        tokens = tokens + nn.Dense(d, dtype=self.dtype, name="proj")(o)

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(tokens)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return tokens + h


# ---------------------------------------------------------------------------
# DPT neck / fusion
# ---------------------------------------------------------------------------

class ResidualUnit(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return h + x


class FusionLayer(nn.Module):
    """RefineNet-style fusion: add lateral through a residual unit, refine,
    2x bilinear upsample (align_corners=True), 1x1 projection."""

    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lateral=None):
        if lateral is not None:
            if lateral.shape[1:3] != x.shape[1:3]:
                lateral = resize_bilinear(lateral, x.shape[1:3], align_corners=False)
            x = x + ResidualUnit(self.ch, self.dtype, name="ru1")(lateral)
        x = ResidualUnit(self.ch, self.dtype, name="ru2")(x)
        x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]), align_corners=True)
        return nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="out")(x)


# ---------------------------------------------------------------------------
# the full model
# ---------------------------------------------------------------------------

class DPTHybrid(nn.Module):
    """DPT-Hybrid (MiDaS dpt_hybrid) — sizes default to the production model;
    every dimension is overridable so parity tests run a tiny replica."""

    embedding_size: int = 64
    bit_hidden: Sequence[int] = (256, 512, 1024)
    bit_depths: Sequence[int] = (3, 4, 9)
    num_groups: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    vit_taps: Sequence[int] = (8, 11)
    fusion_hidden: int = 256
    pos_grid: int = 24  # 384/16 pretraining grid
    ln_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = x.shape
        assert h % 32 == 0 and w % 32 == 0, f"H,W must be /32, got {h}x{w}"
        x = x.astype(self.dtype)

        # ---- BiT stem + stages ------------------------------------------
        hbit = WSConv(self.embedding_size, (7, 7), (2, 2), dtype=self.dtype,
                      name="bit_stem_conv")(x)
        hbit = GNAct(self.num_groups, dtype=self.dtype, name="bit_stem_norm")(hbit)
        hbit = nn.max_pool(hbit, (3, 3), strides=(2, 2), padding="SAME")

        stage_feats = []
        for s, (ch, depth) in enumerate(zip(self.bit_hidden, self.bit_depths)):
            stride = 1 if s == 0 else 2
            mid = _make_div(ch * 0.25)
            for i in range(depth):
                hbit = BitBottleneck(
                    out_ch=ch, mid_ch=mid, stride=stride if i == 0 else 1,
                    has_down=(i == 0), num_groups=self.num_groups,
                    dtype=self.dtype, name=f"stage{s}_block{i}",
                )(hbit)
            stage_feats.append(hbit)
        s1, s2, s3 = stage_feats[0], stage_feats[1], stage_feats[-1]

        # ---- ViT on the /16 grid ----------------------------------------
        gh, gw = s3.shape[1], s3.shape[2]
        tokens = nn.Conv(self.hidden_size, (1, 1), dtype=self.dtype,
                         name="vit_proj")(s3)
        tokens = tokens.reshape(n, gh * gw, self.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_size))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pos_grid * self.pos_grid + 1, self.hidden_size))
        # resize the pretraining position grid to (gh, gw), bilinear,
        # align_corners=False (MiDaS _resize_pos_embed)
        pos_tok, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(1, self.pos_grid, self.pos_grid, -1)
        pos_grid = resize_bilinear(pos_grid, (gh, gw), align_corners=False)
        pos_grid = pos_grid.reshape(1, gh * gw, -1)
        tokens = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), tokens], axis=1)
        tokens = tokens + jnp.concatenate([pos_tok, pos_grid], axis=1)

        taps = []
        for i in range(self.num_layers):
            tokens = ViTBlock(self.hidden_size, self.num_heads, self.mlp_dim,
                              self.ln_eps, self.dtype, name=f"block{i}")(tokens)
            if i in tuple(self.vit_taps):
                taps.append(tokens)
        t3, t4 = taps  # NO final LayerNorm on taps (hook semantics)

        # ---- neck: readout-project + reassemble -------------------------
        def readout(tok, idx):
            cls_t, grid_t = tok[:, :1], tok[:, 1:]
            cat = jnp.concatenate(
                [grid_t, jnp.broadcast_to(cls_t, grid_t.shape)], axis=-1
            )
            proj = nn.Dense(self.hidden_size, dtype=self.dtype,
                            name=f"readout{idx}")(cat)
            proj = nn.gelu(proj, approximate=False)
            return proj.reshape(n, gh, gw, self.hidden_size)

        l3 = nn.Conv(self.hidden_size, (1, 1), dtype=self.dtype,
                     name="neck_proj3")(readout(t3, 3))
        l4 = nn.Conv(self.hidden_size, (1, 1), dtype=self.dtype,
                     name="neck_proj4")(readout(t4, 4))
        l4 = nn.Conv(self.hidden_size, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="neck_down4")(l4)

        rn = []
        for idx, feat in enumerate((s1, s2, l3, l4), start=1):
            rn.append(nn.Conv(self.fusion_hidden, (3, 3), padding=1,
                              use_bias=False, dtype=self.dtype,
                              name=f"rn{idx}")(feat))

        # ---- fusion (refinenet4 -> 1) ------------------------------------
        f = FusionLayer(self.fusion_hidden, self.dtype, name="fusion4")(rn[3])
        f = FusionLayer(self.fusion_hidden, self.dtype, name="fusion3")(f, rn[2])
        f = FusionLayer(self.fusion_hidden, self.dtype, name="fusion2")(f, rn[1])
        f = FusionLayer(self.fusion_hidden, self.dtype, name="fusion1")(f, rn[0])

        # ---- head ---------------------------------------------------------
        d = nn.Conv(self.fusion_hidden // 2, (3, 3), padding=1,
                    dtype=self.dtype, name="head_conv1")(f)
        d = resize_bilinear(d, (2 * d.shape[1], 2 * d.shape[2]), align_corners=True)
        d = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(d)
        d = nn.relu(d)
        d = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(d)
        d = nn.relu(d)
        return d[..., 0]


def detect_depth_midas(params, frames: jnp.ndarray,
                       model: DPTHybrid) -> jnp.ndarray:
    """frames (N,H,W,3) in [-1,1] -> relative inverse depth (N,H,W)."""
    return model.apply({"params": params}, frames)


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

def _hf_to_midas_names(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Translate an HF `Intel/dpt-hybrid-midas`-style DPTForDepthEstimation
    state dict to the official MiDaS naming (q/k/v fused into qkv)."""
    out: Dict[str, np.ndarray] = {}
    pre = "pretrained.model."
    # fuse attention q/k/v per layer
    layers = sorted({
        int(k.split(".")[3]) for k in sd if k.startswith("dpt.encoder.layer.")
    })
    for i in layers:
        base = f"dpt.encoder.layer.{i}."
        for suff in ("weight", "bias"):
            q = sd[base + f"attention.attention.query.{suff}"]
            kk = sd[base + f"attention.attention.key.{suff}"]
            v = sd[base + f"attention.attention.value.{suff}"]
            out[f"{pre}blocks.{i}.attn.qkv.{suff}"] = np.concatenate([q, kk, v], axis=0)
        for src, dst in (
            ("layernorm_before", "norm1"), ("layernorm_after", "norm2"),
            ("attention.output.dense", "attn.proj"),
            ("intermediate.dense", "mlp.fc1"), ("output.dense", "mlp.fc2"),
        ):
            for suff in ("weight", "bias"):
                out[f"{pre}blocks.{i}.{dst}.{suff}"] = sd[base + f"{src}.{suff}"]

    direct = {
        "dpt.embeddings.cls_token": pre + "cls_token",
        "dpt.embeddings.position_embeddings": pre + "pos_embed",
        "dpt.embeddings.projection.weight": pre + "patch_embed.proj.weight",
        "dpt.embeddings.projection.bias": pre + "patch_embed.proj.bias",
    }
    for k, v in sd.items():
        if k in direct:
            out[direct[k]] = v
            continue
        if k.startswith("dpt.embeddings.backbone.bit.embedder."):
            tail = k.split("embedder.")[1]
            tail = tail.replace("convolution.", "conv.").replace("norm.", "norm.")
            out[pre + "patch_embed.backbone.stem." + tail] = v
        elif k.startswith("dpt.embeddings.backbone.bit.encoder.stages."):
            rest = k.split("encoder.stages.")[1]  # e.g. 0.layers.0.conv1.weight
            parts = rest.split(".")
            s, i, tail = parts[0], parts[2], ".".join(parts[3:])
            tail = tail.replace("convolution.", "conv.")
            out[f"{pre}patch_embed.backbone.stages.{s}.blocks.{i}.{tail}"] = v
        elif k.startswith("neck.reassemble_stage.readout_projects."):
            idx = int(k.split(".")[3])  # 2 or 3 (0/1 are ignored stages)
            suff = k.split(".")[-1]
            out[f"pretrained.act_postprocess{idx + 1}.0.project.0.{suff}"] = v
        elif k.startswith("neck.reassemble_stage.layers."):
            idx = int(k.split(".")[3])
            suff = k.split(".")[-1]
            if ".projection." in k:
                out[f"pretrained.act_postprocess{idx + 1}.3.{suff}"] = v
            elif ".resize." in k:
                out[f"pretrained.act_postprocess{idx + 1}.4.{suff}"] = v
        elif k.startswith("neck.convs."):
            idx = int(k.split(".")[2])
            out[f"scratch.layer{idx + 1}_rn.weight"] = v
        elif k.startswith("neck.fusion_stage.layers."):
            idx = int(k.split(".")[3])  # 0..3 = refinenet4..1
            ref = 4 - idx
            tail = k.split(f"layers.{idx}.")[1]
            tail = (tail.replace("residual_layer", "resConfUnit")
                        .replace("convolution", "conv")
                        .replace("projection", "out_conv"))
            out[f"scratch.refinenet{ref}.{tail}"] = v
        elif k.startswith("head.head."):
            out["scratch.output_conv." + k[len("head.head."):]] = v
    return out


def convert_dpt_midas(
    sd: Dict[str, np.ndarray],
    bit_depths: Sequence[int] = (3, 4, 9),
    num_layers: int = 12,
    vit_taps: Sequence[int] = (8, 11),
) -> Dict:
    """MiDaS dpt_hybrid (or HF DPT-hybrid) state dict -> DPTHybrid params."""
    from ...io.torch_convert import t_conv2d, t_linear

    if any(k.startswith("dpt.") for k in sd):
        sd = _hf_to_midas_names(sd)
    if any(k.startswith("model.") for k in sd) and not any(
        k.startswith("pretrained.") for k in sd
    ):
        # MiDaSInference wraps the net under 'model.'
        sd = {k[len("model."):]: v for k, v in sd.items()}

    p: Dict[str, Any] = {}

    def conv(dst, src, bias=True):
        p[dst] = {"kernel": t_conv2d(sd[src + ".weight"])}
        if bias:
            p[dst]["bias"] = np.asarray(sd[src + ".bias"])

    def dense(dst, src):
        p[dst] = {"kernel": t_linear(sd[src + ".weight"]),
                  "bias": np.asarray(sd[src + ".bias"])}

    def gn(dst, src):
        p[dst] = {"gn": {"scale": np.asarray(sd[src + ".weight"]),
                         "bias": np.asarray(sd[src + ".bias"])}}

    pre = "pretrained.model."
    conv("bit_stem_conv", pre + "patch_embed.backbone.stem.conv", bias=False)
    gn("bit_stem_norm", pre + "patch_embed.backbone.stem.norm")
    for s, depth in enumerate(bit_depths):
        for i in range(depth):
            src = f"{pre}patch_embed.backbone.stages.{s}.blocks.{i}"
            blk: Dict[str, Any] = {}
            for j in (1, 2, 3):
                blk[f"conv{j}"] = {"kernel": t_conv2d(sd[f"{src}.conv{j}.weight"])}
                blk[f"norm{j}"] = {"gn": {
                    "scale": np.asarray(sd[f"{src}.norm{j}.weight"]),
                    "bias": np.asarray(sd[f"{src}.norm{j}.bias"]),
                }}
            if f"{src}.downsample.conv.weight" in sd:
                blk["down_conv"] = {
                    "kernel": t_conv2d(sd[f"{src}.downsample.conv.weight"])
                }
                blk["down_norm"] = {"gn": {
                    "scale": np.asarray(sd[f"{src}.downsample.norm.weight"]),
                    "bias": np.asarray(sd[f"{src}.downsample.norm.bias"]),
                }}
            p[f"stage{s}_block{i}"] = blk

    p["cls_token"] = np.asarray(sd[pre + "cls_token"])
    p["pos_embed"] = np.asarray(sd[pre + "pos_embed"])
    conv("vit_proj", pre + "patch_embed.proj")
    for i in range(num_layers):
        src = f"{pre}blocks.{i}"
        blk = {}
        for nm, tsrc in (("norm1", "norm1"), ("norm2", "norm2")):
            blk[nm] = {"scale": np.asarray(sd[f"{src}.{tsrc}.weight"]),
                       "bias": np.asarray(sd[f"{src}.{tsrc}.bias"])}
        for nm, tsrc in (("qkv", "attn.qkv"), ("proj", "attn.proj"),
                         ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            blk[nm] = {"kernel": t_linear(sd[f"{src}.{tsrc}.weight"]),
                       "bias": np.asarray(sd[f"{src}.{tsrc}.bias"])}
        p[f"block{i}"] = blk

    dense("readout3", "pretrained.act_postprocess3.0.project.0")
    dense("readout4", "pretrained.act_postprocess4.0.project.0")
    conv("neck_proj3", "pretrained.act_postprocess3.3")
    conv("neck_proj4", "pretrained.act_postprocess4.3")
    conv("neck_down4", "pretrained.act_postprocess4.4")
    for idx in (1, 2, 3, 4):
        conv(f"rn{idx}", f"scratch.layer{idx}_rn", bias=False)
        fus: Dict[str, Any] = {}
        for ru in (1, 2):
            unit: Dict[str, Any] = {}
            for cj in (1, 2):
                w = sd[f"scratch.refinenet{idx}.resConfUnit{ru}.conv{cj}.weight"]
                b = sd[f"scratch.refinenet{idx}.resConfUnit{ru}.conv{cj}.bias"]
                unit[f"conv{cj}"] = {"kernel": t_conv2d(w), "bias": np.asarray(b)}
            fus[f"ru{ru}"] = unit
        fus["out"] = {
            "kernel": t_conv2d(sd[f"scratch.refinenet{idx}.out_conv.weight"]),
            "bias": np.asarray(sd[f"scratch.refinenet{idx}.out_conv.bias"]),
        }
        p[f"fusion{idx}"] = fus
    conv("head_conv1", "scratch.output_conv.0")
    conv("head_conv2", "scratch.output_conv.2")
    conv("head_conv3", "scratch.output_conv.4")
    return p
