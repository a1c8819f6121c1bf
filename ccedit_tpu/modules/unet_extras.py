"""Auxiliary UNet variants from the tail of the reference's openaimodel.

Parity targets (studied, not copied; unused by every shipped config —
implemented for inventory completeness):
  * NoTimeUNetModel — openaimodel.py:1642-1645: a UNet that zeroes the
    timesteps before the forward.
  * AttentionBlock — openaimodel.py:857-910: the legacy pre-transformer
    spatial self-attention (GN32 -> 1x1 qkv -> multi-head softmax ->
    zero-init 1x1 proj, residual).
  * AttentionPool2d — openaimodel.py:40-71: CLIP-style attention pooling
    (mean token prepended, learned positional embedding, first token out).
  * EncoderUNetModel — openaimodel.py:1648-1864: the classifier half-UNet
    (guided-diffusion) with adaptive / attention / spatial / spatial_v2
    pooling heads.

TPU-first: channels-last (N, H, W, C); attention as batched einsum (these
are cold classifier paths — XLA's fused SDPA is plenty; no pallas)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import normal as normal_init, zeros as zeros_init

from .blocks import Downsample, ResBlock
from .layers import TimeEmbed, timestep_embedding
from .unet import UNetModel

Dtype = Any


class NoTimeUNetModel(UNetModel):
    """UNetModel that ignores the timestep input (openaimodel.py:1642-1645)."""

    def __call__(self, x, timesteps, context=None, y=None, **kwargs):
        timesteps = jnp.zeros_like(timesteps)
        return super().__call__(x, timesteps, context=context, y=y, **kwargs)


def _heads(channels: int, num_heads: int, num_head_channels: int) -> int:
    if num_head_channels == -1:
        return num_heads
    assert channels % num_head_channels == 0, (
        f"channels {channels} not divisible by num_head_channels "
        f"{num_head_channels}")
    return channels // num_head_channels


def _qkv_attention(qkv: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, T, 3C) -> (B, T, C) multi-head softmax attention (QKVAttention-
    Legacy semantics: heads split after the fused qkv projection)."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // n_heads
    qkv = qkv.reshape(b, t, 3, n_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, H, D)
    scale = 1.0 / jnp.sqrt(jnp.sqrt(d).astype(jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
    w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    return out.reshape(b, t, c)


class AttentionBlock(nn.Module):
    """Legacy spatial self-attention block (openaimodel.py:857-910)."""

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        nh = _heads(c, self.num_heads, self.num_head_channels)
        tokens = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                              name="norm")(x).reshape(n, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)
        out = _qkv_attention(qkv, nh)
        out = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                       dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(n, h, w, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (openaimodel.py:40-71): prepend the mean
    token, add a learned positional embedding, attend, return token 0."""

    spacial_dim: int  # sic — reference spelling
    embed_dim: int
    num_heads_channels: int
    output_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            normal_init(1.0 / jnp.sqrt(jnp.asarray(float(c)))),
            (self.spacial_dim ** 2 + 1, c))
        tokens = tokens + pos[None].astype(tokens.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(tokens)
        out = _qkv_attention(qkv, c // self.num_heads_channels)
        out = nn.Dense(self.output_dim or c, dtype=self.dtype,
                       name="c_proj")(out)
        return out[:, 0]


class EncoderUNetModel(nn.Module):
    """The half UNet with a pooled classification head
    (openaimodel.py:1648-1864)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    pool: str = "adaptive"  # adaptive | attention | spatial | spatial_v2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps):
        ch = self.model_channels
        emb = TimeEmbed(4 * ch, dtype=self.dtype, name="time_embed")(
            timestep_embedding(timesteps, ch))

        spatial_means = []

        def note(h):
            if self.pool.startswith("spatial"):
                spatial_means.append(h.mean(axis=(1, 2)).astype(x.dtype))

        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        note(h)
        cur = ch
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for nr in range(self.num_res_blocks):
                h = ResBlock(
                    channels=cur, emb_channels=4 * ch,
                    out_channels=mult * ch,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"in_{level}_{nr}_res")(h, emb)
                cur = mult * ch
                if ds in self.attention_resolutions:
                    h = AttentionBlock(
                        channels=cur, num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype, name=f"in_{level}_{nr}_attn")(h)
                note(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(
                        channels=cur, emb_channels=4 * ch, down=True,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        dtype=self.dtype, name=f"down_{level}_res")(h, emb)
                else:
                    h = Downsample(channels=cur, use_conv=self.conv_resample,
                                   dtype=self.dtype,
                                   name=f"down_{level}")(h)
                ds *= 2
                note(h)

        h = ResBlock(channels=cur, emb_channels=4 * ch,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res1")(h, emb)
        h = AttentionBlock(channels=cur, num_heads=self.num_heads,
                           num_head_channels=self.num_head_channels,
                           dtype=self.dtype, name="mid_attn")(h)
        h = ResBlock(channels=cur, emb_channels=4 * ch,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res2")(h, emb)

        if self.pool == "adaptive":
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name="out_norm")(h)
            h = nn.silu(h)
            h = h.mean(axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d((1,1))
            h = nn.Conv(self.out_channels, (1, 1), kernel_init=zeros_init,
                        bias_init=zeros_init, dtype=self.dtype,
                        name="out_conv")(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            assert self.num_head_channels != -1
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name="out_norm")(h)
            h = nn.silu(h)
            return AttentionPool2d(
                spacial_dim=self.image_size // ds, embed_dim=cur,
                num_heads_channels=self.num_head_channels,
                output_dim=self.out_channels, dtype=self.dtype,
                name="out_pool")(h)
        if self.pool in ("spatial", "spatial_v2"):
            note(h)
            feats = jnp.concatenate(spatial_means, axis=-1)
            feats = nn.Dense(2048, dtype=self.dtype, name="out_fc1")(feats)
            if self.pool == "spatial_v2":
                feats = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     dtype=self.dtype,
                                     name="out_norm")(feats)
                feats = nn.silu(feats)
            else:
                feats = nn.relu(feats)
            return nn.Dense(self.out_channels, dtype=self.dtype,
                            name="out_fc2")(feats)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")
