"""ZoeDepth (metric depth) backbone — TPU-native flax implementation.

Behavioural parity target: ``DepthZoeEncoder``
(sgm/modules/encoders/modules.py:1289-1344) running ZoeD_M12_N: a BEiT-L/384
MiDaS core (DPT neck + relative-depth head) plus the ZoeDepth metric-bins
head (seed bin regressor -> 4 attractor refinements over the fusion pyramid
-> conditional log-binomial over 64 bins).  The architecture contract is
pinned against transformers' ``ZoeDepthForDepthEstimation`` (the public
reference implementation of the same checkpoint family) with random weights
in tests/test_depth_parity.py.

Structure (channels-last flax):
  * BEiT encoder: per-layer decomposed relative position bias (+3 cls
    entries), q/v-bias-only projections, layer-scale gammas;
  * DPT reassemble (readout 'project', factors 4/2/1/0.5) + fusion pyramid;
  * relative head (3 convs, x2 upsample) -> rel_depth + 32ch features;
  * metric head: softplus seed bins, projectors, AttractorLayerUnnormed
    (inv_attractor with the fixed alpha=300/gamma=2 defaults the torch code
    effectively uses), conditional log-binomial softmax, expectation depth.

Weight conversion accepts the HF ZoeDepth state_dict layout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dpt_midas import resize_bilinear

Dtype = Any


# ---------------------------------------------------------------------------
# BEiT encoder
# ---------------------------------------------------------------------------

def beit_relative_position_index(h: int, w: int) -> np.ndarray:
    """Window relative-position index for (h*w + 1) tokens incl. cls; the
    last 3 table entries are cls-to-token / token-to-cls / cls-to-cls."""
    num_rel = (2 * h - 1) * (2 * w - 1)
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    index = np.zeros((h * w + 1, h * w + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    # cls rows exactly as transformers BeitRelativePositionBias
    # .generate_relative_position_index: row0 (cls->token) = num_rel,
    # col0 (token->cls) = num_rel+1, [0,0] (cls->cls) = num_rel+2
    index[0, 0:] = num_rel
    index[0:, 0] = num_rel + 1
    index[0, 0] = num_rel + 2
    return index


def interpolate_rel_bias_table(table: np.ndarray, new_grid: Tuple[int, int],
                               old_grid: Optional[Tuple[int, int]] = None
                               ) -> np.ndarray:
    """Resample a BEiT relative-position bias table to a new patch grid.

    Replicates transformers' ``BeitRelativePositionBias.forward`` (the MiDaS
    v3.1 arbitrary-window modification) bit-for-bit, including its quirk of
    reshaping the flat (old_h*old_w) axis as (old_w, old_h) before the
    bilinear resize.  ``table``: ((2h-1)(2w-1)+3, heads).  The 3 trailing
    cls rows pass through unchanged.
    """
    import jax.numpy as _jnp

    rows = table.shape[0] - 3
    if old_grid is None:
        s = int(round(np.sqrt(rows)))
        if s * s != rows:
            raise ValueError(f"cannot infer square grid from {rows} rows")
        old_grid = ((s + 1) // 2, (s + 1) // 2)
    old_h, old_w = 2 * old_grid[0] - 1, 2 * old_grid[1] - 1
    new_h, new_w = 2 * new_grid[0] - 1, 2 * new_grid[1] - 1
    if (old_h, old_w) == (new_h, new_w):
        return table
    sub = table[: old_h * old_w].reshape(1, old_w, old_h, -1)  # HF quirk
    sub = np.asarray(
        resize_bilinear(_jnp.asarray(sub, _jnp.float32), (new_h, new_w),
                        align_corners=False))
    sub = sub.reshape(new_h * new_w, -1)
    return np.concatenate([sub, table[old_h * old_w:]], axis=0)


class BeitBlock(nn.Module):
    hidden: int
    heads: int
    n_rel: int  # relative table rows
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_index):
        d = self.hidden // self.heads
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln1")(x)
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(h)
        b, l, _ = q.shape

        def split(t):
            return t.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        table = self.param("rel_bias", nn.initializers.zeros,
                           (self.n_rel, self.heads))
        bias = table[rel_index].transpose(2, 0, 1)[None]  # (1,H,L,L)
        logits = logits + bias.astype(jnp.float32)
        weights = nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.hidden)
        out = nn.Dense(self.hidden, dtype=self.dtype, name="proj")(out)
        g1 = self.param("gamma_1", nn.initializers.ones, (self.hidden,))
        x = x + g1.astype(x.dtype) * out

        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.hidden * 4, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        g2 = self.param("gamma_2", nn.initializers.ones, (self.hidden,))
        return x + g2.astype(x.dtype) * h


class BeitEncoder(nn.Module):
    """Returns token sequences (incl. cls) at ``out_indices`` layers."""

    hidden: int = 1024
    heads: int = 16
    layers: int = 24
    patch: int = 16
    out_indices: Sequence[int] = (5, 11, 17, 23)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> List[jnp.ndarray]:
        b, ih, iw, _ = images.shape
        ph, pw = ih // self.patch, iw // self.patch
        x = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(images)
        x = x.reshape(b, ph * pw, self.hidden)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.hidden)), x], 1)
        rel_index = jnp.asarray(beit_relative_position_index(ph, pw))
        n_rel = (2 * ph - 1) * (2 * pw - 1) + 3
        outs = []
        for i in range(self.layers):
            x = BeitBlock(self.hidden, self.heads, n_rel, dtype=self.dtype,
                          name=f"blocks_{i}")(x, rel_index)
            if i in self.out_indices:
                outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# DPT neck (reassemble + fusion) and heads
# ---------------------------------------------------------------------------

class PreActResidual(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return x + h


class FusionLayer(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_bilinear(residual, x.shape[1:3],
                                           align_corners=False)
            x = x + PreActResidual(self.ch, dtype=self.dtype, name="res1")(residual)
        x = PreActResidual(self.ch, dtype=self.dtype, name="res2")(x)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                            align_corners=True)
        return nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="proj")(x)


class ZoeDepthN(nn.Module):
    """Single-head ZoeDepth (the N / ZoeD_M12_N configuration)."""

    hidden: int = 1024
    heads: int = 16
    layers: int = 24
    patch: int = 16
    out_indices: Sequence[int] = (5, 11, 17, 23)
    neck_hidden: Sequence[int] = (256, 512, 1024, 1024)
    factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_ch: int = 256
    n_bins: int = 64
    bin_embedding_dim: int = 128
    num_attractors: Sequence[int] = (16, 8, 4, 1)
    num_relative_features: int = 32
    seed_mlp_dim: int = 256   # SeedBinRegressor fixed hidden (HF default)
    proj_mlp_dim: int = 128   # Projector fixed hidden (HF default)
    min_temp: float = 0.0212
    max_temp: float = 50.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) normalized.  Returns (metric_depth (B,h,w),
        rel_depth (B,h,w))."""
        b, ih, iw, _ = images.shape
        ph, pw = ih // self.patch, iw // self.patch
        tokens = BeitEncoder(self.hidden, self.heads, self.layers, self.patch,
                             self.out_indices, dtype=self.dtype,
                             name="backbone")(images)

        # reassemble (readout 'project' + per-stage resize)
        feats = []
        for i, t in enumerate(tokens):
            cls, patches = t[:, :1], t[:, 1:]
            readout = jnp.broadcast_to(cls, patches.shape)
            h = jnp.concatenate([patches, readout], axis=-1)
            h = nn.Dense(self.hidden, dtype=self.dtype,
                         name=f"readout_{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = h.reshape(b, ph, pw, self.hidden)
            h = nn.Conv(self.neck_hidden[i], (1, 1), dtype=self.dtype,
                        name=f"reassemble_proj_{i}")(h)
            f = self.factors[i]
            if f > 1:
                # ConvTranspose with kernel == stride has no window overlap:
                # out[y*s+u, x*s+v, o] = sum_c x[y,x,c] * K[u,v,c,o] — an
                # exact einsum+reshape (sidesteps kernel-flip conventions)
                s_ = int(f)
                kern = self.param(
                    f"reassemble_resize_{i}_kernel",
                    nn.initializers.lecun_normal(),
                    (s_, s_, self.neck_hidden[i], self.neck_hidden[i]))
                bias_ = self.param(f"reassemble_resize_{i}_bias",
                                   nn.initializers.zeros,
                                   (self.neck_hidden[i],))
                bb, hh, ww, cc = h.shape
                h = jnp.einsum("bhwc,uvco->bhuwvo", h,
                               kern.astype(h.dtype))
                h = h.reshape(bb, hh * s_, ww * s_, self.neck_hidden[i])
                h = h + bias_.astype(h.dtype)
            elif f < 1:
                h = nn.Conv(self.neck_hidden[i], (3, 3),
                            strides=(int(1 / f), int(1 / f)), padding=1,
                            dtype=self.dtype,
                            name=f"reassemble_resize_{i}")(h)
            h = nn.Conv(self.fusion_ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"neck_conv_{i}")(h)
            feats.append(h)

        bottleneck = feats[-1]  # deepest 256ch (1/32 after factor 0.5)

        # fusion pyramid (deepest first; stage i fuses the running state
        # with the next-shallower reassembled feature)
        fused = []
        state = None
        for i, f in enumerate(feats[::-1]):
            layer = FusionLayer(self.fusion_ch, dtype=self.dtype,
                                name=f"fusion_{i}")
            state = layer(f) if state is None else layer(state, f)
            fused.append(state)

        # relative head on the last (finest) fusion output
        h = nn.Conv(self.fusion_ch // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="rel_conv1")(fused[-1])
        h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2),
                            align_corners=True)
        h = nn.Conv(self.num_relative_features, (3, 3), padding=1,
                    dtype=self.dtype, name="rel_conv2")(h)
        h = nn.relu(h)
        rel_features = h
        rel_depth = nn.relu(
            nn.Conv(1, (1, 1), dtype=self.dtype, name="rel_conv3")(h))[..., 0]

        # ---- metric head -------------------------------------------------
        x = nn.Conv(self.fusion_ch, (1, 1), dtype=self.dtype,
                    name="bottleneck_conv")(bottleneck)
        s = nn.Conv(self.seed_mlp_dim, (1, 1), dtype=self.dtype,
                    name="seed_mlp1")(x)
        s = nn.relu(s)
        s = nn.Conv(self.n_bins, (1, 1), dtype=self.dtype, name="seed_mlp2")(s)
        prev_bin = nn.softplus(s)  # unnormed seed centers

        prev_emb = nn.Conv(self.proj_mlp_dim, (1, 1), dtype=self.dtype,
                           name="seed_proj1")(x)
        prev_emb = nn.relu(prev_emb)
        prev_emb = nn.Conv(self.bin_embedding_dim, (1, 1), dtype=self.dtype,
                           name="seed_proj2")(prev_emb)

        bin_centers = prev_bin
        for i, feat in enumerate(fused):
            emb = nn.Conv(self.proj_mlp_dim, (1, 1), dtype=self.dtype,
                          name=f"proj{i}_1")(feat)
            emb = nn.relu(emb)
            emb = nn.Conv(self.bin_embedding_dim, (1, 1), dtype=self.dtype,
                          name=f"proj{i}_2")(emb)
            a_in = emb + resize_bilinear(prev_emb, emb.shape[1:3],
                                         align_corners=True)
            a = nn.Conv(self.bin_embedding_dim, (1, 1), dtype=self.dtype,
                        name=f"attr{i}_1")(a_in)
            a = nn.relu(a)
            a = nn.Conv(self.num_attractors[i], (1, 1), dtype=self.dtype,
                        name=f"attr{i}_2")(a)
            attractors = nn.softplus(a)
            centers = resize_bilinear(prev_bin, emb.shape[1:3],
                                      align_corners=True)
            dx = attractors[..., None] - centers[..., None, :]
            # inv_attractor with its scripted defaults (alpha=300, gamma=2 —
            # the torch code never forwards config.attractor_alpha);
            # attractor_kind 'mean' divides by the attractor count
            delta = jnp.sum(dx / (1.0 + 300.0 * jnp.square(dx)), axis=-2)
            delta = delta / float(self.num_attractors[i])
            bin_centers = centers + delta
            prev_bin, prev_emb = bin_centers, emb

        # conditional log-binomial over bins
        rel_cond = rel_features
        last = jnp.concatenate(
            [rel_cond,
             resize_bilinear(rel_depth[..., None], rel_cond.shape[1:3],
                             align_corners=True)], axis=-1)
        emb_up = resize_bilinear(prev_emb, last.shape[1:3], align_corners=True)
        mlp_in = jnp.concatenate([last, emb_up], axis=-1)
        bott = (self.num_relative_features + 1 + self.bin_embedding_dim) // 2
        p = nn.Conv(bott, (1, 1), dtype=self.dtype, name="clb_1")(mlp_in)
        p = nn.gelu(p, approximate=False)
        p = nn.Conv(4, (1, 1), dtype=self.dtype, name="clb_2")(p)
        p = nn.softplus(p) + 1e-4
        prob = p[..., 0] / (p[..., 0] + p[..., 1])
        temp = p[..., 2] / (p[..., 2] + p[..., 3])
        temp = (self.max_temp - self.min_temp) * temp + self.min_temp

        k = self.n_bins
        k_idx = jnp.arange(k, dtype=jnp.float32)
        log_binom_coef = (jax.scipy.special.gammaln(jnp.asarray(float(k)))
                          - jax.scipy.special.gammaln(k_idx + 1.0)
                          - jax.scipy.special.gammaln(float(k) - k_idx))
        prob = jnp.clip(prob, 1e-4, 1.0)
        one_m = jnp.clip(1.0 - prob, 1e-4, 1.0)
        y = (log_binom_coef[None, None, None, :]
             + k_idx * jnp.log(prob)[..., None]
             + (k - 1 - k_idx) * jnp.log(one_m)[..., None])
        probs = nn.softmax(y / temp[..., None], axis=-1)

        centers_up = resize_bilinear(bin_centers, probs.shape[1:3],
                                     align_corners=True)
        depth = jnp.sum(probs * centers_up, axis=-1)
        return depth, rel_depth


def zoedepth_grid_for(h: int, w: int, patch: int = 16) -> Tuple[int, int]:
    """The patch grid ``detect_depth_zoe`` runs at for an (h, w) input
    (inputs are edge-padded to a multiple of 2*patch)."""
    mult = patch * 2
    hp = h + (mult - h % mult) % mult
    wp = w + (mult - w % mult) % mult
    return hp // patch, wp // patch


def adapt_zoedepth_grid(params: Dict, grid: Tuple[int, int]) -> Dict:
    """Resample every BEiT rel-bias table in converted params to ``grid``.

    Must be fed checkpoint-grid params (square tables) — resampling twice
    from an already-adapted set would double-interpolate.
    """
    out = dict(params)
    bb = dict(out["backbone"])
    for k, v in bb.items():
        if k.startswith("blocks_"):
            blk = dict(v)
            blk["rel_bias"] = interpolate_rel_bias_table(
                np.asarray(blk["rel_bias"]), grid)
            bb[k] = blk
    out["backbone"] = bb
    return out


def detect_depth_zoe(params, frames01: jnp.ndarray,
                     model: Optional[ZoeDepthN] = None) -> jnp.ndarray:
    """frames01: (N,H,W,3) in [0,1] (the encoder maps [-1,1]->[0,1] first,
    modules.py:1324).  ImageNet-normalizes, pads H/W to the patch multiple,
    returns metric depth (N,H,W)."""
    model = model or ZoeDepthN()
    mean = jnp.asarray([0.5, 0.5, 0.5], frames01.dtype)
    std = jnp.asarray([0.5, 0.5, 0.5], frames01.dtype)
    x = (frames01 - mean) / std
    n, h, w, _ = x.shape
    mult = model.patch * 2
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    depth, _ = model.apply({"params": params}, x)
    depth = resize_bilinear(depth[..., None], (x.shape[1], x.shape[2]),
                            align_corners=False)[..., 0]
    return depth[:, :h, :w]


# ---------------------------------------------------------------------------
# weight conversion: HF ZoeDepthForDepthEstimation state_dict -> flax params
# ---------------------------------------------------------------------------

def _lin(sd, k):
    return {"kernel": np.asarray(sd[f"{k}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{k}.bias"], np.float32)}


def _conv(sd, k, bias=True):
    out = {"kernel": np.transpose(np.asarray(sd[f"{k}.weight"], np.float32),
                                  (2, 3, 1, 0))}
    if bias:
        out["bias"] = np.asarray(sd[f"{k}.bias"], np.float32)
    return out


def _ln(sd, k):
    return {"scale": np.asarray(sd[f"{k}.weight"], np.float32),
            "bias": np.asarray(sd[f"{k}.bias"], np.float32)}


def convert_zoedepth(sd: Dict[str, np.ndarray], layers: int = 24,
                     grid: Optional[Tuple[int, int]] = None) -> Dict:
    """transformers ZoeDepthForDepthEstimation state_dict -> ZoeDepthN params.

    ``grid``: the runtime patch grid (H//patch, W//patch).  The checkpoint's
    relative-position bias tables are pinned to the pretraining window (24x24
    for ZoeD_M12_N / BEiT-L-384); running any other input size requires
    resampling them — transformers does it per-forward, we do it once here
    (the flax param shape is the runtime grid's).  Required whenever the
    input size differs from the pretraining one.
    """
    sd = dict(sd)
    p: Dict = {"backbone": {}}
    bb = "backbone.embeddings"
    p["backbone"]["patch_embed"] = _conv(sd, f"{bb}.patch_embeddings.projection")
    p["backbone"]["cls_token"] = np.asarray(sd[f"{bb}.cls_token"], np.float32)
    for i in range(layers):
        e = f"backbone.encoder.layer.{i}"
        att = f"{e}.attention.attention"
        q_b = np.asarray(sd[f"{att}.q_bias"], np.float32) \
            if f"{att}.q_bias" in sd else np.asarray(
                sd[f"{att}.query.bias"], np.float32)
        blk = {
            "ln1": _ln(sd, f"{e}.layernorm_before"),
            "ln2": _ln(sd, f"{e}.layernorm_after"),
            "q": {"kernel": np.asarray(sd[f"{att}.query.weight"], np.float32).T,
                  "bias": q_b},
            "k": {"kernel": np.asarray(sd[f"{att}.key.weight"], np.float32).T},
            "v": {"kernel": np.asarray(sd[f"{att}.value.weight"], np.float32).T,
                  "bias": np.asarray(sd.get(f"{att}.v_bias",
                                            sd.get(f"{att}.value.bias")),
                                     np.float32)},
            "proj": _lin(sd, f"{e}.attention.output.dense"),
            "fc1": _lin(sd, f"{e}.intermediate.dense"),
            "fc2": _lin(sd, f"{e}.output.dense"),
            "gamma_1": np.asarray(sd[f"{e}.lambda_1"], np.float32),
            "gamma_2": np.asarray(sd[f"{e}.lambda_2"], np.float32),
            "rel_bias": np.asarray(
                sd[f"{att}.relative_position_bias"
                   ".relative_position_bias_table"], np.float32),
        }
        if grid is not None:
            blk["rel_bias"] = interpolate_rel_bias_table(blk["rel_bias"], grid)
        p["backbone"][f"blocks_{i}"] = blk

    for i in range(4):
        rs = f"neck.reassemble_stage"
        p[f"readout_{i}"] = _lin(sd, f"{rs}.readout_projects.{i}.0")
        p[f"reassemble_proj_{i}"] = _conv(sd, f"{rs}.layers.{i}.projection")
        if f"{rs}.layers.{i}.resize.weight" in sd:
            w = np.asarray(sd[f"{rs}.layers.{i}.resize.weight"], np.float32)
            if i < 2:
                # ConvTranspose: torch (in, out, kh, kw) -> (kh, kw, in, out)
                p[f"reassemble_resize_{i}_kernel"] = np.transpose(
                    w, (2, 3, 0, 1))
                p[f"reassemble_resize_{i}_bias"] = np.asarray(
                    sd[f"{rs}.layers.{i}.resize.bias"], np.float32)
            else:  # stride-2 Conv: torch (out, in, kh, kw) -> HWIO
                p[f"reassemble_resize_{i}"] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),
                    "bias": np.asarray(sd[f"{rs}.layers.{i}.resize.bias"],
                                       np.float32)}
        p[f"neck_conv_{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)
        fl = f"neck.fusion_stage.layers.{i}"
        p[f"fusion_{i}"] = {
            "proj": _conv(sd, f"{fl}.projection"),
            "res1": {"conv1": _conv(sd, f"{fl}.residual_layer1.convolution1"),
                     "conv2": _conv(sd, f"{fl}.residual_layer1.convolution2")},
            "res2": {"conv1": _conv(sd, f"{fl}.residual_layer2.convolution1"),
                     "conv2": _conv(sd, f"{fl}.residual_layer2.convolution2")},
        }
    p["rel_conv1"] = _conv(sd, "relative_head.conv1")
    p["rel_conv2"] = _conv(sd, "relative_head.conv2")
    p["rel_conv3"] = _conv(sd, "relative_head.conv3")

    mh = "metric_head"
    p["bottleneck_conv"] = _conv(sd, f"{mh}.conv2")
    p["seed_mlp1"] = _conv(sd, f"{mh}.seed_bin_regressor.conv1")
    p["seed_mlp2"] = _conv(sd, f"{mh}.seed_bin_regressor.conv2")
    p["seed_proj1"] = _conv(sd, f"{mh}.seed_projector.conv1")
    p["seed_proj2"] = _conv(sd, f"{mh}.seed_projector.conv2")
    for i in range(4):
        p[f"proj{i}_1"] = _conv(sd, f"{mh}.projectors.{i}.conv1")
        p[f"proj{i}_2"] = _conv(sd, f"{mh}.projectors.{i}.conv2")
        p[f"attr{i}_1"] = _conv(sd, f"{mh}.attractors.{i}.conv1")
        p[f"attr{i}_2"] = _conv(sd, f"{mh}.attractors.{i}.conv2")
    p["clb_1"] = _conv(sd, f"{mh}.conditional_log_binomial.mlp.0")
    p["clb_2"] = _conv(sd, f"{mh}.conditional_log_binomial.mlp.2")
    return p
