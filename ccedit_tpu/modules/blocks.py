"""UNet residual / resampling blocks, 2D and pseudo-3D.

Behavioural parity targets (studied, not copied):
  * spatial_temporal factorization — openaimodel.py:129-178
  * ResBlock (2D)                  — openaimodel.py:397-554
  * ResBlock3D                     — openaimodel.py:557-775
  * Upsample / Upsample3D          — openaimodel.py:181-266
  * Downsample / Downsample3D      — openaimodel.py:283-394

Layouts: 2D blocks take (N, H, W, C); 3D blocks take (B, T, H, W, C).
Every temporal twin is zero-initialized, so a fresh pseudo-3D block computes
exactly its 2D function per frame (verified by tests/test_blocks.py).

Torch-conv parity note: stride-2 convs use explicit ((1,1),(1,1)) padding to
match torch's padding=1 (XLA 'SAME' would pad asymmetrically).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import zeros as zeros_init

from ..ops.quant import QConv, QDense
from ..ops.video import fold_time, temporal_to_tokens, tokens_to_temporal

Dtype = Any


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C), nearest. Implemented as repeat (exact,
    and cheaper than jax.image.resize's gather lowering)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class Upsample(nn.Module):
    """nearest 2x + optional conv3x3 (openaimodel.py:181-217)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = QConv(
                self.out_channels or self.channels, (3, 3), padding="SAME",
                dtype=self.dtype, name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    """conv3x3 stride-2 (pad 1,1) or 2x2 avg-pool (openaimodel.py:283-321)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return QConv(
                self.out_channels or self.channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype, name="op",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class TemporalConv(nn.Module):
    """Zero-init 1D conv over the T axis of (B*H*W, T, C) tokens — the
    universal temporal twin (zero_module(conv_nd(1, ...)))."""

    channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return QConv(
            self.channels, (self.kernel_size,), padding="SAME",
            kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="conv",
        )(x)


def spatial_temporal(x, spatial_fn, temporal_fn, identity_fn=None, alpha=None):
    """The pseudo-3D primitive (openaimodel.py:129-178) in BTHWC layout.

    x: (B, T, H, W, C).  spatial_fn acts on (B*T, H, W, C); temporal_fn on
    (B*H*W, T, C).  identity_fn transforms the temporal-branch skip (default
    identity).  alpha (learnable scalar): out = a*skip + (1-a)*temporal.
    """
    b = x.shape[0]
    xs = spatial_fn(fold_time(x))
    _, h, w, _ = xs.shape
    xt = tokens_to_temporal(xs, b)
    identity = xt if identity_fn is None else identity_fn(xt)
    if temporal_fn is None:
        out = identity
    else:
        y = temporal_fn(xt)
        out = alpha * identity + (1 - alpha) * y if alpha is not None else identity + y
    xs = temporal_to_tokens(out, b, h, w)
    return xs.reshape(b, x.shape[1], h, w, xs.shape[-1])


class Upsample3D(nn.Module):
    """Per-frame nearest 2x + pseudo-3D conv (openaimodel.py:220-266)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = x.reshape(b * t, h, w, c)
        x = nearest_upsample_2x(x)
        x = x.reshape(b, t, 2 * h, 2 * w, c)
        if not self.use_conv:
            return x
        out_ch = self.out_channels or self.channels
        conv = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv")
        tconv = TemporalConv(out_ch, dtype=self.dtype, name="conv_temporal")
        return spatial_temporal(x, conv, tconv)


class Downsample3D(nn.Module):
    """Pseudo-3D strided downsample (openaimodel.py:324-394, timedownscale=1)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.use_conv:
            b, t, h, w, c = x.shape
            x = x.reshape(b * t, h, w, c)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return x.reshape(b, t, h // 2, w // 2, c)
        out_ch = self.out_channels or self.channels
        conv = QConv(
            out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="op",
        )
        tconv = TemporalConv(out_ch, dtype=self.dtype, name="conv_temporal")
        return spatial_temporal(x, conv, tconv)


class ResBlock(nn.Module):
    """2D residual block with timestep conditioning (openaimodel.py:397-554).

    in_layers: GN32 -> SiLU -> conv3x3 ; emb: SiLU -> Dense ;
    out_layers: GN32 -> SiLU -> zero conv3x3 ; skip: identity / conv1x1.
    """

    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    up: bool = False
    down: bool = False
    skip_t_emb: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)

        if self.up or self.down:
            resample = (
                nearest_upsample_2x
                if self.up
                else lambda y: nn.avg_pool(y, (2, 2), strides=(2, 2))
            )
            h = resample(h)
            x = resample(x)

        h = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="in_conv")(h)

        if self.skip_t_emb:
            emb_out = jnp.zeros((x.shape[0], out_ch), dtype=h.dtype)
        else:
            emb_out = QDense(
                2 * out_ch if self.use_scale_shift_norm else out_ch,
                dtype=self.dtype, name="emb_dense",
            )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = QConv(
            out_ch, (3, 3), padding="SAME", kernel_init=zeros_init,
            bias_init=zeros_init, dtype=self.dtype, name="out_conv",
        )(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv_skip:
            skip = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="skip_conv")(x)
        else:
            skip = QConv(out_ch, (1, 1), dtype=self.dtype, name="skip_conv")(x)
        return skip + h


class ResBlock3D(nn.Module):
    """Pseudo-3D residual block (openaimodel.py:557-775): every 2D conv gets a
    zero-init 1D temporal twin (incl. the skip projection), each with its own
    GN+SiLU prelude; optional learnable alpha blends.

    ``ssn`` mode (ResBlock3DSSN, openaimodel.py:778-854): an additional
    per-channel (scale, shift) pair from an appearance embedding modulates the
    out-norm activation: ``inject * (1 + scale2) + shift2`` (composed with the
    timestep scale/shift when use_scale_shift_norm).  ``return_inject`` also
    returns the pre-modulation normalized activation.

    Input/output: (B, T, H, W, C).
    """

    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    up: bool = False
    down: bool = False
    skip_t_emb: bool = False
    temporal_kernel_size: int = 3
    use_learnable_alpha: bool = False
    ssn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, img_emb=None, return_inject: bool = False):
        out_ch = self.out_channels or self.channels
        b, t = x.shape[0], x.shape[1]

        alpha1 = alpha2 = None
        if self.use_learnable_alpha:
            alpha1 = self.param("alpha_temporal1", nn.initializers.ones, ())
            alpha2 = self.param("alpha_temporal2", nn.initializers.ones, ())

        in_norm = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="in_norm")
        in_conv = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="in_conv")
        in_tnorm = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="in_norm_temporal")
        in_tconv = TemporalConv(out_ch, self.temporal_kernel_size, dtype=self.dtype, name="in_conv_temporal")

        def resample5d(y, up):
            bb, tt, hh, ww, cc = y.shape
            y = y.reshape(bb * tt, hh, ww, cc)
            y = nearest_upsample_2x(y) if up else nn.avg_pool(y, (2, 2), strides=(2, 2))
            return y.reshape(bb, tt, y.shape[1], y.shape[2], cc)

        identity = x
        if self.up or self.down:
            # 3D path (openaimodel.py:700-712): norm+silu, per-frame resample,
            # then pseudo-3D conv; identity resampled separately.
            def rest(y):
                return nn.silu(in_norm(y))
            y = rest(x)
            y = resample5d(y, self.up)
            x5 = spatial_temporal(
                y,
                lambda z: in_conv(z),
                lambda z: in_tconv(nn.silu(in_tnorm(z))),
                alpha=alpha1,
            )
            identity = resample5d(identity, self.up)
        else:
            x5 = spatial_temporal(
                x,
                lambda z: in_conv(nn.silu(in_norm(z))),
                lambda z: in_tconv(nn.silu(in_tnorm(z))),
                alpha=alpha1,
            )

        if self.skip_t_emb:
            emb_out = jnp.zeros((b, out_ch), dtype=x5.dtype)
        else:
            emb_out = QDense(
                2 * out_ch if self.use_scale_shift_norm else out_ch,
                dtype=self.dtype, name="emb_dense",
            )(nn.silu(emb))

        out_norm = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_norm")
        out_conv = QConv(
            out_ch, (3, 3), padding="SAME", kernel_init=zeros_init,
            bias_init=zeros_init, dtype=self.dtype, name="out_conv",
        )
        out_tnorm = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="out_norm_temporal")
        out_tconv = TemporalConv(out_ch, self.temporal_kernel_size, dtype=self.dtype, name="out_conv_temporal")

        if self.ssn and img_emb is not None:
            scale2, shift2 = jnp.split(img_emb, 2, axis=-1)
            while scale2.ndim < x5.ndim:
                scale2, shift2 = scale2[:, None], shift2[:, None]
        else:
            scale2 = shift2 = None

        inject = None
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, None, :], 2, axis=-1)
            inject = out_norm(x5)
            if scale2 is not None:
                x5 = inject * (1 + scale) * (1 + scale2) + shift + shift2
            else:
                x5 = inject * (1 + scale) + shift
            x5 = spatial_temporal(
                x5,
                lambda z: out_conv(nn.silu(z)),
                lambda z: out_tconv(nn.silu(out_tnorm(z))),
                alpha=alpha2,
            )
        else:
            x5 = x5 + emb_out[:, None, None, None, :]
            if self.ssn:
                # SSN always norms explicitly so the inject point exists
                # (openaimodel.py:836-845)
                inject = out_norm(x5)
                if scale2 is not None:
                    x5_mod = inject * (1 + scale2) + shift2
                else:
                    x5_mod = inject
                x5 = spatial_temporal(
                    x5_mod,
                    lambda z: out_conv(nn.silu(z)),
                    lambda z: out_tconv(nn.silu(out_tnorm(z))),
                    alpha=alpha2,
                )
            else:
                x5 = spatial_temporal(
                    x5,
                    lambda z: out_conv(nn.silu(out_norm(z))),
                    lambda z: out_tconv(nn.silu(out_tnorm(z))),
                    alpha=alpha2,
                )

        # skip connection: pseudo-3D too (openaimodel.py:717-736)
        if out_ch == self.channels:
            skip = identity  # temporal twin is None -> pure identity
        else:
            if self.use_conv_skip:
                sconv = QConv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="skip_conv")
            else:
                sconv = QConv(out_ch, (1, 1), dtype=self.dtype, name="skip_conv")
            stconv = TemporalConv(
                out_ch,
                self.temporal_kernel_size if self.use_conv_skip else 1,
                dtype=self.dtype, name="skip_conv_temporal",
            )
            skip = spatial_temporal(identity, sconv, stconv)
        out = skip + x5
        if return_inject:
            return out, inject
        return out
