"""Transformer blocks: 2D spatial, factorized 3D spatio-temporal, and CFCA.

Behavioural parity targets (studied, not copied):
  * CrossAttention / FeedForward(GEGLU) — sgm/modules/attention.py:115-141,365-467
  * BasicTransformerBlock               — attention.py:598-716
  * BasicTransformerSingleLayerBlock    — attention.py:719-761
  * SpatialTransformer (2D)             — attention.py:764-889
  * SpatialTransformer3D                — attention.py:1000-1208
  * SpatialTransformer3DCA (CFCA)       — attention.py:1211-1350
  * reference-bank CFCA (hooked forward)— controlmodel.py:339-469  (redesigned
    here as an explicit ``ref_context`` input — no hooks, jit-able)

TPU-first notes: channels-last tokens, one attention dispatch point
(ops.attention), zero-init temporal projections so a fresh 3D model computes
exactly the per-frame 2D function (the core CCEdit training trick).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import zeros as zeros_init

from ..ops.attention import dot_product_attention
from ..ops.quant import QConv, QDense
from ..ops.video import (
    fold_time,
    repeat_ctx_temporal,
    temporal_to_tokens,
    tokens_to_temporal,
)

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    q/k/v projections have no bias, the output projection does
    (attention.py:392-403).  ``kv_reuse_every`` implements the TokenFlow-style
    cross-frame k/v reuse (attention.py:414-423): every n-th batch entry's
    keys/values are shared by the following n entries.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, kv_reuse_every: int = 0):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = QDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = QDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = QDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        if kv_reuse_every:
            n = kv_reuse_every
            assert k.shape[0] % n == 0
            k = jnp.repeat(k[::n], n, axis=0)
            v = jnp.repeat(v[::n], n, axis=0)

        def split_heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = dot_product_attention(split_heads(q), split_heads(k), split_heads(v))
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        return QDense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = QDense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    glu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        else:
            x = nn.gelu(QDense(inner, dtype=self.dtype, name="net_0")(x))
        return QDense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """self-attn -> text cross-attn -> GEGLU FF, pre-LN residuals."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    gated_ff: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, kv_reuse_every: int = 0):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            context_dim=self.context_dim if self.disable_self_attn else None,
            dtype=self.dtype,
            name="attn1",
        )(
            h,
            context=context if self.disable_self_attn else None,
            kv_reuse_every=0 if self.disable_self_attn else kv_reuse_every,
        )
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="attn2",
        )(h, context=context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, glu=self.gated_ff, dtype=self.dtype, name="ff")(h)
        return x


class BasicTransformerSingleLayerBlock(nn.Module):
    """One attention + FF.  Note: when used as self-attention via
    ``context=x`` the context is the *un-normalized* x (attention.py:758-761)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="attn1",
        )(h, context=context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


def _proj(features, use_linear, zero, dtype, name):
    """proj_in/out: 1x1 conv (use_linear=False) or dense; optionally zero-init.
    On NHWC a 1x1 conv and a dense are the same compute; we keep both so the
    param tree mirrors the checkpoint family being loaded."""
    init = dict(kernel_init=zeros_init, bias_init=zeros_init) if zero else {}
    if use_linear:
        return QDense(features, dtype=dtype, name=name, **init)
    return QConv(features, kernel_size=(1, 1), dtype=dtype, name=name, **init)


class SpatialTransformer(nn.Module):
    """2D token transformer over (N, H, W, C) with conv/linear projections.

    attention.py:764-889.  ``disable_text_ca`` replaces the full blocks with
    self-attention-only single blocks (:807-830).
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = False
    disable_self_attn: bool = False
    disable_text_ca: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, kv_reuse_every: int = 0):
        return self._st_body(x, context, kv_reuse_every)

    def _st_body(self, x, context=None, kv_reuse_every: int = 0):
        n, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if not self.use_linear:
            x = _proj(inner, False, False, self.dtype, "proj_in")(x)
        x = x.reshape(n, h * w, -1)
        if self.use_linear:
            x = _proj(inner, True, False, self.dtype, "proj_in")(x)

        for d in range(self.depth):
            if self.disable_text_ca:
                x = BasicTransformerSingleLayerBlock(
                    inner, self.n_heads, self.d_head, context_dim=None,
                    dtype=self.dtype, name=f"blocks_{d}",
                )(x)
            else:
                x = BasicTransformerBlock(
                    inner, self.n_heads, self.d_head,
                    context_dim=self.context_dim,
                    disable_self_attn=self.disable_self_attn,
                    dtype=self.dtype, name=f"blocks_{d}",
                )(x, context=context, kv_reuse_every=kv_reuse_every)

        if self.use_linear:
            x = _proj(self.in_channels, True, True, self.dtype, "proj_out")(x)
        x = x.reshape(n, h, w, -1)
        if not self.use_linear:
            x = _proj(self.in_channels, False, True, self.dtype, "proj_out")(x)
        return x + x_in


class SpatialTransformerCA(SpatialTransformer):
    """2D SpatialTransformer + a reference cross-attention sub-layer whose
    k/v come from banked appearance features (attention.py:892-997; consumed
    by the RAIG 2D reference-attention generator, controlmodel.py:620-719).

    The reference injects ``ref_control`` by module attribute; here it is the
    explicit ``ref_context`` argument: (N, hw_ref, C) tokens.
    """

    @nn.compact
    def __call__(self, x, context=None, ref_context=None, kv_reuse_every: int = 0):
        x = self._st_body(x, context=context, kv_reuse_every=kv_reuse_every)
        if ref_context is None:
            return x
        n, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_ca")(x)
        x = _proj(inner, self.use_linear, False, self.dtype, "proj_in_ca")(x)
        x = x.reshape(n, h * w, -1)
        x = BasicTransformerSingleLayerBlock(
            inner, self.n_heads, self.d_head, context_dim=None,
            dtype=self.dtype, name="blocks_ca_0",
        )(x, context=ref_context)
        if self.use_linear:
            x = _proj(self.in_channels, True, True, self.dtype, "proj_out_ca")(x)
            x = x.reshape(n, h, w, -1)
        else:
            x = x.reshape(n, h, w, -1)
            x = _proj(self.in_channels, False, True, self.dtype, "proj_out_ca")(x)
        return x + x_in


class SpatialTransformer3D(nn.Module):
    """Factorized video transformer: spatial attention over (B*T, H*W, C),
    then temporal attention over (B*H*W, T, C) with *zero-init* temporal
    projections and a residual (optionally learnable-alpha blended).

    attention.py:1000-1208.  Input/output layout: (B, T, H, W, C).
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = False
    disable_self_attn: bool = False
    disable_temporal_text_ca: bool = True
    use_learnable_alpha: bool = False
    dtype: Dtype = jnp.float32

    def _spatial(self, x, context, b, t):
        """(B*T, H, W, C) tokens path; context already per-frame repeated."""
        n, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if not self.use_linear:
            x = _proj(inner, False, False, self.dtype, "proj_in")(x)
        x = x.reshape(n, h * w, -1)
        if self.use_linear:
            x = _proj(inner, True, False, self.dtype, "proj_in")(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.n_heads, self.d_head,
                context_dim=self.context_dim,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype, name=f"blocks_{d}",
            )(x, context=context)
        if self.use_linear:
            x = _proj(self.in_channels, True, True, self.dtype, "proj_out")(x)
        x = x.reshape(n, h, w, -1)
        if not self.use_linear:
            x = _proj(self.in_channels, False, True, self.dtype, "proj_out")(x)
        return x + x_in

    def _temporal(self, x, context_tok, b):
        """(B*H*W, T, C) path; *both* projections zero-init (attention.py:1087-1135)."""
        inner = self.n_heads * self.d_head
        x_in = x
        x = nn.GroupNorm(
            num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_temporal"
        )(x)
        # 1D conv k=1 == dense; zero-init in both parameterizations
        if self.use_linear:
            x = QDense(inner, kernel_init=zeros_init, bias_init=zeros_init,
                         dtype=self.dtype, name="proj_in_temporal")(x)
        else:
            x = QConv(inner, kernel_size=(1,), kernel_init=zeros_init,
                        bias_init=zeros_init, dtype=self.dtype,
                        name="proj_in_temporal")(x)
        for d in range(self.depth):
            if self.disable_temporal_text_ca:
                blk = BasicTransformerSingleLayerBlock(
                    inner, self.n_heads, self.d_head, context_dim=None,
                    dtype=self.dtype, name=f"blocks_temporal_{d}",
                )
                x = blk(x, context=x)  # un-normalized x as context (:1191-1194)
            else:
                blk = BasicTransformerBlock(
                    inner, self.n_heads, self.d_head,
                    context_dim=self.context_dim,
                    disable_self_attn=self.disable_self_attn,
                    dtype=self.dtype, name=f"blocks_temporal_{d}",
                )
                x = blk(x, context=context_tok)
        if self.use_linear:
            x = QDense(self.in_channels, kernel_init=zeros_init,
                         bias_init=zeros_init, dtype=self.dtype,
                         name="proj_out_temporal")(x)
        else:
            x = QConv(self.in_channels, kernel_size=(1,), kernel_init=zeros_init,
                        bias_init=zeros_init, dtype=self.dtype,
                        name="proj_out_temporal")(x)
        if self.use_learnable_alpha:
            alpha = self.param("alpha_temporal", nn.initializers.ones, (1,))
            return alpha * x_in + (1 - alpha) * x
        return x_in + x

    @nn.compact
    def __call__(self, x, context=None, ref_context=None):
        b, t, h, w, c = x.shape
        ctx_spatial = (
            jnp.repeat(context, t, axis=0) if context is not None else None
        )  # (B*T, L, D)
        xs = self._spatial(fold_time(x), ctx_spatial, b, t)
        xt = tokens_to_temporal(xs, b)
        ctx_temporal = (
            repeat_ctx_temporal(context, h, w) if context is not None else None
        )
        xt = self._temporal(xt, ctx_temporal, b)
        out = temporal_to_tokens(xt, b, h, w)
        return out.reshape(b, t, h, w, c)


class SpatialTransformer3DCA(SpatialTransformer3D):
    """SpatialTransformer3D + a 5th attention: cross-frame cross-attention
    (CFCA) of every frame's tokens against an anchor (attention.py:1211-1350).

    ``ca_type``:
      * 'center'      — k/v = center-frame tokens
      * 'self'        — k/v = own tokens
      * 'center_self' — k/v = concat(center, own)  (production tvi2v config)

    ``ref_context`` — our explicit redesign of the reference's forward-hook
    bank (controlmodel.py:339-469): per-(B,) banked appearance-branch tokens
    (B, H*W, C); when given, k/v come from it and ``ca_type`` is bypassed,
    matching the hacked forward which always uses the bank directly.
    """

    ca_type: str = "center"

    def _cfca(self, x, b, t, ref_context):
        inner = self.n_heads * self.d_head
        n, h, w, c = x.shape
        x_in = x
        x = nn.GroupNorm(
            num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_temporal_ca"
        )(x)
        x = _proj(inner, self.use_linear, False, self.dtype, "proj_in_temporal_ca")(x)
        x = x.reshape(n, h * w, -1)

        if ref_context is not None:
            anchor = jnp.repeat(ref_context, t, axis=0)  # (B*T, hw, C)
        else:
            xb = x.reshape(b, t, h * w, -1)
            anchor = jnp.repeat(xb[:, t // 2], t, axis=0)  # (B*T, hw, C)
            if self.ca_type == "self":
                anchor = x
            elif self.ca_type == "center_self":
                anchor = jnp.concatenate([anchor, x], axis=1)
            elif self.ca_type != "center":
                raise ValueError(self.ca_type)

        x = BasicTransformerSingleLayerBlock(
            inner, self.n_heads, self.d_head, context_dim=None,
            dtype=self.dtype, name="blocks_temporal_ca_0",
        )(x, context=anchor)

        if self.use_linear:
            x = _proj(self.in_channels, True, True, self.dtype, "proj_out_temporal_ca")(x)
            x = x.reshape(n, h, w, -1)
        else:
            x = x.reshape(n, h, w, -1)
            x = _proj(self.in_channels, False, True, self.dtype, "proj_out_temporal_ca")(x)
        return x + x_in

    @nn.compact
    def __call__(self, x, context=None, ref_context=None):
        b, t, h, w, c = x.shape
        ctx_spatial = jnp.repeat(context, t, axis=0) if context is not None else None
        xs = self._spatial(fold_time(x), ctx_spatial, b, t)
        xt = tokens_to_temporal(xs, b)
        ctx_temporal = (
            repeat_ctx_temporal(context, h, w) if context is not None else None
        )
        xt = self._temporal(xt, ctx_temporal, b)
        xs = temporal_to_tokens(xt, b, h, w)
        xs = self._cfca(xs, b, t, ref_context)
        return xs.reshape(b, t, h, w, c)
