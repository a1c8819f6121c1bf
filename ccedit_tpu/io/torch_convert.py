"""PyTorch checkpoint -> flax param-tree converter.

Covers the four key families the reference loads (SURVEY.md §5; reference
loaders: sgm/models/diffusion.py:113-137, scripts/sampling/util.py:45-112):
  * Lightning checkpoints ({'state_dict': ...} nesting)
  * deepspeed ('_forward_module.' prefix)
  * SD-1.5 base checkpoints ('cond_stage_model.transformer' -> CLIP,
    'first_stage_model' -> VAE, 'model.diffusion_model' -> UNet)
  * safetensors files
plus kohya-style LoRA merge (convert_load_lora, util.py:115-272) in lora.py.

Weight-layout transforms (torch -> flax, channels-last):
  Linear  (O,I)      -> kernel (I,O)
  Conv2d  (O,I,kh,kw)-> kernel (kh,kw,I,O)
  Conv1d  (O,I,k)    -> kernel (k,I,O)
  Norm    weight/bias-> scale/bias
  Embed   weight     -> embedding

All pure numpy — no torch import needed when the checkpoint is already a
numpy dict; torch (CPU) is used only to deserialize .ckpt/.pt files.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import flax

# ---------------------------------------------------------------------------
# deserialization
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .ckpt/.pt/.pth/.safetensors file into {name: np.ndarray},
    handling Lightning nesting and deepspeed prefixes
    (diffusion.py:113-137, util.py:45-61)."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        sd = {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}
    out = {}
    for k, v in sd.items():
        if k.startswith("_forward_module."):
            k = k[len("_forward_module.") :]
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# low-level transforms
# ---------------------------------------------------------------------------

def t_linear(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def t_conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_conv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


class _TreeBuilder:
    def __init__(self, sd: Dict[str, np.ndarray], strict: bool = True):
        self.sd = sd
        self.out: Dict[tuple, np.ndarray] = {}
        self.used = set()
        self.missing = []
        self.strict = strict

    def _get(self, key: str) -> Optional[np.ndarray]:
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        self.missing.append(key)
        if self.strict:
            raise KeyError(f"missing checkpoint key {key!r}")
        return None

    def put(self, dst: str, val: Optional[np.ndarray]):
        if val is not None:
            self.out[tuple(dst.split("/"))] = val

    def linear(self, src: str, dst: str, bias: bool = True):
        w = self._get(f"{src}.weight")
        if w is not None:
            self.put(f"{dst}/kernel", t_linear(w))
        if bias and f"{src}.bias" in self.sd:
            self.put(f"{dst}/bias", self._get(f"{src}.bias"))

    def conv2d(self, src: str, dst: str):
        w = self._get(f"{src}.weight")
        if w is not None:
            self.put(f"{dst}/kernel", t_conv2d(w))
        if f"{src}.bias" in self.sd:
            self.put(f"{dst}/bias", self._get(f"{src}.bias"))

    def conv1d(self, src: str, dst: str):
        w = self._get(f"{src}.weight")
        if w is not None:
            self.put(f"{dst}/kernel", t_conv1d(w))
        if f"{src}.bias" in self.sd:
            self.put(f"{dst}/bias", self._get(f"{src}.bias"))

    def norm(self, src: str, dst: str):
        w = self._get(f"{src}.weight")
        b = self._get(f"{src}.bias")
        self.put(f"{dst}/scale", w)
        self.put(f"{dst}/bias", b)

    def raw(self, src: str, dst: str):
        self.put(dst, self._get(src))

    def tree(self):
        return flax.traverse_util.unflatten_dict(self.out)


# ---------------------------------------------------------------------------
# transformer blocks
# ---------------------------------------------------------------------------

def _basic_block(b: _TreeBuilder, src: str, dst: str, single: bool = False):
    """BasicTransformerBlock / SingleLayerBlock."""
    b.linear(f"{src}.attn1.to_q", f"{dst}/attn1/to_q", bias=False)
    b.linear(f"{src}.attn1.to_k", f"{dst}/attn1/to_k", bias=False)
    b.linear(f"{src}.attn1.to_v", f"{dst}/attn1/to_v", bias=False)
    b.linear(f"{src}.attn1.to_out.0", f"{dst}/attn1/to_out")
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    b.linear(f"{src}.ff.net.0.proj", f"{dst}/ff/net_0/proj")
    b.linear(f"{src}.ff.net.2", f"{dst}/ff/net_2")
    if single:
        b.norm(f"{src}.norm2", f"{dst}/norm2")
        return
    b.linear(f"{src}.attn2.to_q", f"{dst}/attn2/to_q", bias=False)
    b.linear(f"{src}.attn2.to_k", f"{dst}/attn2/to_k", bias=False)
    b.linear(f"{src}.attn2.to_v", f"{dst}/attn2/to_v", bias=False)
    b.linear(f"{src}.attn2.to_out.0", f"{dst}/attn2/to_out")
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    b.norm(f"{src}.norm3", f"{dst}/norm3")


def _spatial_transformer(
    b: _TreeBuilder, src: str, dst: str, depth: int,
    use_linear: bool, video: bool, cfca: bool,
    disable_text_ca: bool = False, disable_temporal_text_ca: bool = True,
):
    b.norm(f"{src}.norm", f"{dst}/norm")
    proj = b.linear if use_linear else b.conv2d
    proj(f"{src}.proj_in", f"{dst}/proj_in")
    proj(f"{src}.proj_out", f"{dst}/proj_out")
    for d in range(depth):
        _basic_block(
            b, f"{src}.transformer_blocks.{d}", f"{dst}/blocks_{d}",
            single=disable_text_ca,
        )
    if f"{src}.norm_ca.weight" in b.sd:
        # 2D SpatialTransformerCA reference-attention sub-layer (RAIG,
        # attention.py:892-997): presence-keyed, depth-1 like the reference.
        b.norm(f"{src}.norm_ca", f"{dst}/norm_ca")
        cproj = b.linear if use_linear else b.conv2d
        cproj(f"{src}.proj_in_ca", f"{dst}/proj_in_ca")
        cproj(f"{src}.proj_out_ca", f"{dst}/proj_out_ca")
        _basic_block(
            b, f"{src}.transformer_blocks_ca.0", f"{dst}/blocks_ca_0", single=True,
        )
    if not video:
        return
    b.norm(f"{src}.norm_temporal", f"{dst}/norm_temporal")
    tproj = b.linear if use_linear else b.conv1d
    tproj(f"{src}.proj_in_temporal", f"{dst}/proj_in_temporal")
    tproj(f"{src}.proj_out_temporal", f"{dst}/proj_out_temporal")
    for d in range(depth):
        _basic_block(
            b, f"{src}.transformer_blocks_temporal.{d}", f"{dst}/blocks_temporal_{d}",
            single=disable_temporal_text_ca,
        )
    if f"{src}.alpha_temporal" in b.sd:
        b.raw(f"{src}.alpha_temporal", f"{dst}/alpha_temporal")
    if cfca and f"{src}.norm_temporal_ca.weight" in b.sd:
        b.norm(f"{src}.norm_temporal_ca", f"{dst}/norm_temporal_ca")
        cproj = b.linear if use_linear else b.conv2d
        cproj(f"{src}.proj_in_temporal_ca", f"{dst}/proj_in_temporal_ca")
        cproj(f"{src}.proj_out_temporal_ca", f"{dst}/proj_out_temporal_ca")
        _basic_block(
            b, f"{src}.transformer_blocks_temporal_ca.0", f"{dst}/blocks_temporal_ca_0",
            single=True,
        )


def _resblock(b: _TreeBuilder, src: str, dst: str, video: bool, has_skip: bool):
    b.norm(f"{src}.in_layers.0", f"{dst}/in_norm")
    b.conv2d(f"{src}.in_layers.2", f"{dst}/in_conv")
    b.linear(f"{src}.emb_layers.1", f"{dst}/emb_dense")
    b.norm(f"{src}.out_layers.0", f"{dst}/out_norm")
    b.conv2d(f"{src}.out_layers.3", f"{dst}/out_conv")
    if has_skip:
        b.conv2d(f"{src}.skip_connection", f"{dst}/skip_conv")
    if not video:
        return
    b.norm(f"{src}.in_layers_temporal.0", f"{dst}/in_norm_temporal")
    b.conv1d(f"{src}.in_layers_temporal.2", f"{dst}/in_conv_temporal/conv")
    b.norm(f"{src}.out_layers_temporal.0", f"{dst}/out_norm_temporal")
    b.conv1d(f"{src}.out_layers_temporal.3", f"{dst}/out_conv_temporal/conv")
    if has_skip:
        b.conv1d(f"{src}.skip_connection_temporal", f"{dst}/skip_conv_temporal/conv")
    for a in ("alpha_temporal1", "alpha_temporal2"):
        if f"{src}.{a}" in b.sd:
            b.raw(f"{src}.{a}", f"{dst}/{a}")


# ---------------------------------------------------------------------------
# UNet / ControlNet
# ---------------------------------------------------------------------------

def _unet_layout(channel_mult: Sequence[int], num_res_blocks, attention_resolutions):
    """Reproduce the torch ModuleList indexing of input/output blocks."""
    nrb = (
        list(num_res_blocks)
        if isinstance(num_res_blocks, (list, tuple))
        else [num_res_blocks] * len(channel_mult)
    )
    input_blocks = [("conv_in", None)]  # torch input_blocks.0
    ds = 1
    for level in range(len(channel_mult)):
        for nr in range(nrb[level]):
            input_blocks.append(("res_attn" if ds in attention_resolutions else "res",
                                 (level, nr)))
        if level != len(channel_mult) - 1:
            input_blocks.append(("down", (level,)))
            ds *= 2
    output_blocks = []
    ds_dec = ds
    for level in reversed(range(len(channel_mult))):
        for i in range(nrb[level] + 1):
            kind = "res_attn" if ds_dec in attention_resolutions else "res"
            up = bool(level) and i == nrb[level]
            output_blocks.append((kind, (level, i), up))
            if up:
                ds_dec //= 2
    return input_blocks, output_blocks, nrb


def convert_unet(
    sd: Dict[str, np.ndarray],
    prefix: str = "model.diffusion_model.",
    video: bool = False,
    cfca: bool = False,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks=2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    transformer_depth: int = 1,
    use_linear: bool = False,
    model_channels: int = 320,
    encoder_only: bool = False,
    disable_text_ca: bool = False,
    strict: bool = True,
) -> Dict:
    """Convert a (sub-)state-dict of an sgm UNetModel(3D)/ControlNet trunk."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    b = _TreeBuilder(sub, strict=strict)

    b.linear("time_embed.0", "time_embed/dense1")
    b.linear("time_embed.2", "time_embed/dense2")
    if "label_emb.0.0.weight" in sub:
        b.linear("label_emb.0.0", "label_emb/dense1")
        b.linear("label_emb.0.2", "label_emb/dense2")

    input_blocks, output_blocks, nrb = _unet_layout(
        channel_mult, num_res_blocks, attention_resolutions
    )

    # channel bookkeeping to know when a resblock has a skip conv
    ch = model_channels
    enc_chans = [ch]
    cur = ch
    for i, entry in enumerate(input_blocks):
        kind = entry[0]
        src = f"input_blocks.{i}"
        if kind == "conv_in":
            b.conv2d(f"{src}.0", "conv_in")
            continue
        if kind == "down":
            (level,) = entry[1]
            b.conv2d(f"{src}.0.op", f"in_{level}_down/op")
            if video:
                b.conv1d(f"{src}.0.conv_temporal", f"in_{level}_down/conv_temporal/conv")
            enc_chans.append(cur)
            continue
        level, nr = entry[1]
        out_ch = channel_mult[level] * model_channels
        _resblock(b, f"{src}.0", f"in_{level}_{nr}_res", video, has_skip=(out_ch != cur))
        cur = out_ch
        enc_chans.append(cur)
        if kind == "res_attn":
            _spatial_transformer(
                b, f"{src}.1", f"in_{level}_{nr}_attn", transformer_depth,
                use_linear, video, cfca, disable_text_ca=disable_text_ca,
            )

    _resblock(b, "middle_block.0", "mid_res1", video, has_skip=False)
    _spatial_transformer(
        b, "middle_block.1", "mid_attn", transformer_depth, use_linear, video,
        cfca, disable_text_ca=disable_text_ca,
    )
    _resblock(b, "middle_block.2", "mid_res2", video, has_skip=False)

    if video:
        b.conv1d("input_blocks_temporal.0", "input_blocks_temporal/conv")

    if not encoder_only:
        chans = list(enc_chans)
        for i, (kind, (level, idx), up) in enumerate(output_blocks):
            src = f"output_blocks.{i}"
            ich = chans.pop()
            out_ch = channel_mult[level] * model_channels
            _resblock(b, f"{src}.0", f"out_{level}_{idx}_res", video,
                      has_skip=(out_ch != cur + ich))
            cur = out_ch
            pos = 1
            if kind == "res_attn":
                _spatial_transformer(
                    b, f"{src}.{pos}", f"out_{level}_{idx}_attn", transformer_depth,
                    use_linear, video, cfca, disable_text_ca=disable_text_ca,
                )
                pos += 1
            if up:
                b.conv2d(f"{src}.{pos}.conv", f"out_{level}_up/conv")
                if video:
                    b.conv1d(f"{src}.{pos}.conv_temporal", f"out_{level}_up/conv_temporal/conv")
        b.norm("out.0", "out_norm")
        b.conv2d("out.2", "out_conv")
        if video:
            b.conv1d("out_temporal.1", "out_temporal/conv")

    return b.tree()


def convert_controlnet(
    sd: Dict[str, np.ndarray],
    prefix: str,
    identity_hint: bool = False,
    strict: bool = True,
    **unet_kwargs,
) -> Dict:
    """ControlNet2D = encoder-only UNet + hint pyramid + zero convs."""
    tree = convert_unet(
        sd, prefix=prefix, encoder_only=True, strict=strict, **unet_kwargs
    )
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    b = _TreeBuilder(sub, strict=strict)
    if not identity_hint:
        # TimestepEmbedSequential children 0,2,...,12 convs + 14 zero conv
        # (controlmodel.py:215-231)
        for i, t_idx in enumerate(range(0, 14, 2)):
            b.conv2d(f"input_hint_block.{t_idx}", f"input_hint_block/conv_{i}")
        b.conv2d("input_hint_block.14", "input_hint_block/conv_out")
    n_zero = len([k for k in sub if k.startswith("zero_convs.") and k.endswith(".0.weight")])
    for i in range(n_zero):
        b.conv2d(f"zero_convs.{i}.0", f"zero_convs_{i}/conv")
    b.conv2d("middle_block_out.0", "middle_block_out/conv")
    # ControlNet3D's pseudo-3D tap twins (controlmodel.py:67-97): a 1x1 1-D
    # zero conv per tap + one for the middle; presence-keyed.
    n_zt = len([k for k in sub
                if k.startswith("zero_convs_temporal.") and k.endswith(".0.weight")])
    for i in range(n_zt):
        b.conv1d(f"zero_convs_temporal.{i}.0", f"zero_convs_temporal_{i}/conv")
    if "middle_block_out_temporal.0.weight" in sub:
        b.conv1d("middle_block_out_temporal.0", "middle_block_out_temporal/conv")
    extra = b.tree()
    tree.update(extra)
    return tree


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def convert_vae(
    sd: Dict[str, np.ndarray],
    prefix: str = "first_stage_model.",
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    strict: bool = True,
) -> Dict:
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    b = _TreeBuilder(sub, strict=strict)

    def res(src, dst, has_nin):
        b.norm(f"{src}.norm1", f"{dst}/norm1")
        b.conv2d(f"{src}.conv1", f"{dst}/conv1")
        b.norm(f"{src}.norm2", f"{dst}/norm2")
        b.conv2d(f"{src}.conv2", f"{dst}/conv2")
        if has_nin:
            b.conv2d(f"{src}.nin_shortcut", f"{dst}/nin_shortcut")

    def attn(src, dst):
        b.norm(f"{src}.norm", f"{dst}/norm")
        for nm in ("q", "k", "v", "proj_out"):
            b.conv2d(f"{src}.{nm}", f"{dst}/{nm}")

    # encoder
    b.conv2d("encoder.conv_in", "encoder/conv_in")
    cur = 1
    for level, mult in enumerate(ch_mult):
        for i in range(num_res_blocks):
            res(f"encoder.down.{level}.block.{i}",
                f"encoder/down_{level}_block_{i}", has_nin=(mult != cur))
            cur = mult
        if level != len(ch_mult) - 1:
            b.conv2d(f"encoder.down.{level}.downsample.conv",
                     f"encoder/down_{level}_downsample/conv")
    res("encoder.mid.block_1", "encoder/mid_block_1", False)
    attn("encoder.mid.attn_1", "encoder/mid_attn_1")
    res("encoder.mid.block_2", "encoder/mid_block_2", False)
    b.norm("encoder.norm_out", "encoder/norm_out")
    b.conv2d("encoder.conv_out", "encoder/conv_out")

    # decoder
    b.conv2d("decoder.conv_in", "decoder/conv_in")
    res("decoder.mid.block_1", "decoder/mid_block_1", False)
    attn("decoder.mid.attn_1", "decoder/mid_attn_1")
    res("decoder.mid.block_2", "decoder/mid_block_2", False)
    cur = ch_mult[-1]
    for level in reversed(range(len(ch_mult))):
        mult = ch_mult[level]
        for i in range(num_res_blocks + 1):
            res(f"decoder.up.{level}.block.{i}",
                f"decoder/up_{level}_block_{i}", has_nin=(mult != cur))
            cur = mult
        if level != 0:
            b.conv2d(f"decoder.up.{level}.upsample.conv",
                     f"decoder/up_{level}_upsample/conv")
    b.norm("decoder.norm_out", "decoder/norm_out")
    b.conv2d("decoder.conv_out", "decoder/conv_out")

    b.conv2d("quant_conv", "quant_conv")
    b.conv2d("post_quant_conv", "post_quant_conv")
    return b.tree()


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def convert_clip(
    sd: Dict[str, np.ndarray],
    prefix: str = "cond_stage_model.transformer.",
    layers: int = 12,
    strict: bool = True,
) -> Dict:
    """HF CLIPTextModel weights -> our CLIPTextModel tree.  Also accepts
    'conditioner.embedders.0.transformer.' (sgm) prefixes."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    # drop the 'text_model.' level if present
    if any(k.startswith("text_model.") for k in sub):
        sub = {k[len("text_model."):]: v for k, v in sub.items() if k.startswith("text_model.")}
    b = _TreeBuilder(sub, strict=strict)
    b.put("token_embedding/embedding", b._get("embeddings.token_embedding.weight"))
    b.put("position_embedding", b._get("embeddings.position_embedding.weight"))
    for i in range(layers):
        src = f"encoder.layers.{i}"
        dst = f"layers_{i}"
        b.norm(f"{src}.layer_norm1", f"{dst}/layer_norm1")
        b.norm(f"{src}.layer_norm2", f"{dst}/layer_norm2")
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            b.linear(f"{src}.self_attn.{nm}", f"{dst}/self_attn/{nm}")
        b.linear(f"{src}.mlp.fc1", f"{dst}/fc1")
        b.linear(f"{src}.mlp.fc2", f"{dst}/fc2")
    b.norm("final_layer_norm", "final_layer_norm")
    return b.tree()


# ---------------------------------------------------------------------------
# full checkpoints
# ---------------------------------------------------------------------------

def convert_sd_checkpoint(
    sd: Dict[str, np.ndarray],
    video: bool = False,
    cfca: bool = False,
    has_controlnet: bool = False,
    has_controlnet_img: bool = False,
    strict: bool = True,
    **unet_kwargs,
) -> Dict:
    """Convert a full SD-1.5 / CCEdit checkpoint into the engine param tree
    {"network": {"unet", ["controlnet", "controlnet_img"]}, "vae",
     "conditioner": {"embedder_0": CLIP}}.

    Handles both SD-1.5 naming (cond_stage_model.*) and sgm naming
    (conditioner.embedders.0.*) — util.py:72-80's rename, inverted.
    """
    network: Dict[str, Any] = {}
    network["unet"] = convert_unet(
        sd, prefix="model.diffusion_model.", video=video, cfca=cfca,
        strict=strict, **unet_kwargs,
    )
    if has_controlnet:
        network["controlnet"] = convert_controlnet(
            sd, prefix="model.diffusion_model.controlnet.", strict=strict,
            **unet_kwargs,
        )
    if has_controlnet_img:
        network["controlnet_img"] = convert_controlnet(
            sd, prefix="model.diffusion_model.controlnet_img.",
            identity_hint=True, strict=strict, disable_text_ca=True,
            **unet_kwargs,
        )
    out: Dict[str, Any] = {"network": network}

    if any(k.startswith("first_stage_model.") for k in sd):
        out["vae"] = convert_vae(sd, strict=strict)

    clip_prefix = None
    for p in ("cond_stage_model.transformer.", "conditioner.embedders.0.transformer."):
        if any(k.startswith(p) for k in sd):
            clip_prefix = p
            break
    if clip_prefix:
        out["conditioner"] = {"embedder_0": convert_clip(sd, prefix=clip_prefix, strict=strict)}
    return out
