"""CLIP ViT-L/14 text transformer (the SD-1.5 text encoder), from scratch.

Behavioural parity target: FrozenCLIPEmbedder (encoders/modules.py:358-420)
wrapping HF CLIPTextModel: 12 layers, width 768, 12 heads, quick-GELU MLP,
causal mask, final LayerNorm; layer select 'last' | 'pooled' | 'hidden'.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention

Dtype = Any


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = d**-0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * scale + mask
        weights = nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        b, h, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    vocab_size: int = 49408
    max_len: int = 77
    width: int = 768
    heads: int = 12
    layers: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        output_layer: str = "last",
        layer_idx: Optional[int] = None,
    ):
        """tokens: (B, L) int32. Returns (B, L, width) for 'last'/'hidden',
        (B, width) for 'pooled' (EOS-position features after final LN)."""
        b, l = tokens.shape
        tok_emb = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                           name="token_embedding")(tokens)
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_len, self.width),
        )
        x = tok_emb + pos_emb[None, :l].astype(tok_emb.dtype)

        mask = jnp.triu(jnp.full((l, l), -np.inf, dtype=jnp.float32), k=1)[None, None]

        hidden = None
        for i in range(self.layers):
            x = CLIPLayer(self.width, self.heads, dtype=self.dtype, name=f"layers_{i}")(x, mask)
            if layer_idx is not None and i == self.layers - 1 + layer_idx:
                hidden = x  # penultimate select: layer_idx=-1 etc. (pre-final-LN)

        final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        if output_layer == "last":
            return final
        if output_layer == "hidden":
            assert hidden is not None, "layer_idx required for output_layer='hidden'"
            return hidden
        if output_layer == "pooled":
            eos_pos = jnp.argmax(tokens, axis=-1)  # EOS has the max token id
            return final[jnp.arange(b), eos_pos]
        raise ValueError(output_layer)
