"""KL-VAE first stage (f=8 SD autoencoder), channels-last.

Behavioural parity targets (studied, not copied):
  * Encoder / Decoder / ResnetBlock / AttnBlock — sgm/modules/diffusionmodules/model.py:30-761
  * DiagonalGaussianDistribution — sgm/modules/distributions/distributions.py:24-72
  * AutoencoderKL (+InferenceWrapper video fold) — sgm/models/autoencoder.py:283-343

Conventions carried over: GroupNorm eps=1e-6 in the VAE, asymmetric (0,1)
downsample padding, logvar clamped to [-30, 20], scale_factor applied by the
engine (0.18215), video tensors folded (B,T,...) -> (B*T,...) around
encode/decode.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant import QConv, QDense
from ..ops.attention import dot_product_attention
from .blocks import nearest_upsample_2x

Dtype = Any


class VAEResnetBlock(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        out_ch = self.out_channels or self.in_channels
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            # timestep conditioning, used only by the full Model
            # (model.py:77-90); the Encoder/Decoder always pass temb=None
            h = h + QDense(out_ch, dtype=self.dtype, name="temb_proj")(
                nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if out_ch != self.in_channels:
            x = QConv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over H*W tokens (model.py:196-287)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hid = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = QConv(c, (1, 1), dtype=self.dtype, name="q")(hid).reshape(n, 1, h * w, c)
        k = QConv(c, (1, 1), dtype=self.dtype, name="k")(hid).reshape(n, 1, h * w, c)
        v = QConv(c, (1, 1), dtype=self.dtype, name="v")(hid).reshape(n, 1, h * w, c)
        out = dot_product_attention(q, k, v).reshape(n, h, w, c)
        out = QConv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class VAEDownsample(nn.Module):
    """conv3x3 stride-2 with LDM's asymmetric (0,1) padding (model.py:163-176)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return QConv(
            self.channels, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class VAEUpsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return QConv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    z_channels: int = 4
    double_z: bool = True
    resolution: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = QConv(self.ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        cur_res = self.resolution
        cur = self.ch
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(cur, self.ch * mult, dtype=self.dtype,
                                   name=f"down_{level}_block_{i}")(h)
                cur = self.ch * mult
                if cur_res in self.attn_resolutions:
                    h = VAEAttnBlock(cur, dtype=self.dtype, name=f"down_{level}_attn_{i}")(h)
            if level != len(self.ch_mult) - 1:
                h = VAEDownsample(cur, dtype=self.dtype, name=f"down_{level}_downsample")(h)
                cur_res //= 2
        h = VAEResnetBlock(cur, cur, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(cur, dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(cur, cur, dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    out_ch: int = 3
    z_channels: int = 4
    resolution: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cur = self.ch * self.ch_mult[-1]
        cur_res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        h = QConv(cur, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(cur, cur, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(cur, dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(cur, cur, dtype=self.dtype, name="mid_block_2")(h)
        for level, mult in reversed(list(enumerate(self.ch_mult))):
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(cur, self.ch * mult, dtype=self.dtype,
                                   name=f"up_{level}_block_{i}")(h)
                cur = self.ch * mult
                if cur_res in self.attn_resolutions:
                    h = VAEAttnBlock(cur, dtype=self.dtype, name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = VAEUpsample(cur, dtype=self.dtype, name=f"up_{level}_upsample")(h)
                cur_res *= 2
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return QConv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)


class VAEModel(nn.Module):
    """The full pixel-space DDPM UNet living in the VAE module family
    (model.py:323-495 — unused by every shipped config; implemented for
    inventory completeness).  Symmetric encoder-decoder with skip
    connections, optional sinusoidal timestep conditioning, and optional
    channel-concat context."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    resolution: int = 256
    use_timestep: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None, context=None):
        from .layers import timestep_embedding

        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        temb = None
        if self.use_timestep:
            assert t is not None
            temb = timestep_embedding(t, self.ch)
            temb = QDense(4 * self.ch, dtype=self.dtype, name="temb_dense0")(temb)
            temb = QDense(4 * self.ch, dtype=self.dtype,
                            name="temb_dense1")(nn.silu(temb))

        in_ch_mult = (1,) + tuple(self.ch_mult)
        n_levels = len(self.ch_mult)
        cur_res = self.resolution

        hs = [QConv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv_in")(x)]
        cur = self.ch
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(cur, self.ch * mult, dtype=self.dtype,
                                   name=f"down_{level}_block_{i}")(hs[-1], temb)
                cur = self.ch * mult
                if cur_res in self.attn_resolutions:
                    h = VAEAttnBlock(cur, dtype=self.dtype,
                                     name=f"down_{level}_attn_{i}")(h)
                hs.append(h)
            if level != n_levels - 1:
                hs.append(VAEDownsample(cur, dtype=self.dtype,
                                        name=f"down_{level}_downsample")(hs[-1]))
                cur_res //= 2

        h = hs[-1]
        h = VAEResnetBlock(cur, cur, dtype=self.dtype, name="mid_block_1")(h, temb)
        h = VAEAttnBlock(cur, dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(cur, cur, dtype=self.dtype, name="mid_block_2")(h, temb)

        for level in reversed(range(n_levels)):
            block_out = self.ch * self.ch_mult[level]
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = VAEResnetBlock(
                    cur + skip.shape[-1], block_out, dtype=self.dtype,
                    name=f"up_{level}_block_{i}",
                )(jnp.concatenate([h, skip], axis=-1), temb)
                cur = block_out
                if cur_res in self.attn_resolutions:
                    h = VAEAttnBlock(cur, dtype=self.dtype,
                                     name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = VAEUpsample(cur, dtype=self.dtype,
                                name=f"up_{level}_upsample")(h)
                cur_res *= 2

        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(h)
        h = nn.silu(h)
        return QConv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)


class DiagonalGaussian:
    """distributions.py:24-72 — mean/logvar split on the channel axis."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AutoencoderKL(nn.Module):
    """Encoder/Decoder + quant convs.  encode() returns moments; use
    DiagonalGaussian on top.  Video tensors (B,T,H,W,C) are folded per-frame
    (autoencoder.py:322-343)."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    resolution: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, in_channels=self.in_channels,
            z_channels=self.z_channels, resolution=self.resolution,
            dtype=self.dtype, name="encoder",
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, out_ch=self.out_ch,
            z_channels=self.z_channels, resolution=self.resolution,
            dtype=self.dtype, name="decoder",
        )
        self.quant_conv = QConv(2 * self.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = QConv(self.z_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    @staticmethod
    def _fold(x) -> Tuple[jnp.ndarray, Optional[int]]:
        if x.ndim == 5:
            b = x.shape[0]
            return x.reshape((-1,) + x.shape[2:]), b
        return x, None

    @staticmethod
    def _unfold(x, b):
        if b is None:
            return x
        return x.reshape((b, -1) + x.shape[1:])

    def encode_moments(self, x):
        x, b = self._fold(x)
        moments = self.quant_conv(self.encoder(x))
        return self._unfold(moments, b)

    def decode(self, z):
        z, b = self._fold(z)
        out = self.decoder(self.post_quant_conv(z))
        return self._unfold(out, b)

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussian(moments)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
