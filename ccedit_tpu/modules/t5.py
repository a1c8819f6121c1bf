"""T5 v1.1 text encoder (and ByT5, same architecture) from scratch.

Behavioural parity targets: FrozenT5Embedder / FrozenByT5Embedder
(sgm/modules/encoders/modules.py:275-355) wrapping HF ``T5EncoderModel``:
returns last_hidden_state over max_length-padded tokens.

T5 specifics implemented exactly (parity-tested against transformers on a
random tiny config in tests/test_text_encoders.py):
  * RMSNorm (scale only, eps 1e-6), applied pre-sublayer, residual add after;
  * relative-position bucket bias computed once in layer 0's attention and
    SHARED by all layers (bidirectional, 32 buckets, max_distance 128);
  * NO 1/sqrt(d) attention scaling (folded into T5's init scheme);
  * gated-GELU feed-forward (wi_0 * gelu-gated, v1.1 style), no biases
    anywhere, final RMSNorm after the stack.

ByT5 tokenization is exact and asset-free (UTF-8 bytes + 3 offset, EOS=1,
PAD=0); classic T5 needs a SentencePiece model supplied by the user.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class T5RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return y * scale.astype(x.dtype)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int = 32,
                              max_distance: int = 128) -> np.ndarray:
    """HF T5 _relative_position_bucket, bidirectional (host-side, static)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


class T5Attention(nn.Module):
    d_model: int
    heads: int
    d_kv: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        inner = self.heads * self.d_kv
        b, l, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)

        def split(t):
            return t.reshape(b, l, self.heads, self.d_kv).transpose(0, 2, 1, 3)

        # NB: T5 does not scale by 1/sqrt(d)
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32)
        logits = logits + bias
        weights = nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="o")(out)


class T5Block(nn.Module):
    d_model: int
    heads: int
    d_kv: int
    d_ff: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        h = T5RMSNorm(dtype=self.dtype, name="ln_attn")(x)
        x = x + T5Attention(self.d_model, self.heads, self.d_kv,
                            dtype=self.dtype, name="attn")(h, bias)
        h = T5RMSNorm(dtype=self.dtype, name="ln_ff")(x)
        g = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
        u = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * u
        h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x + h


class T5Encoder(nn.Module):
    """google/t5-v1_1-* / google/byt5-* encoder stack."""

    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    heads: int = 6
    layers: int = 8
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: (B, L) int32 (already padded).  Returns (B, L, d_model)."""
        b, l = tokens.shape
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="shared")(tokens)
        rel_emb = self.param("relative_attention_bias",
                             nn.initializers.normal(1.0),
                             (self.rel_buckets, self.heads))
        buckets = relative_position_buckets(l, l, self.rel_buckets,
                                            self.rel_max_distance)
        bias = rel_emb[jnp.asarray(buckets)]            # (L, L, H)
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        # padding mask: HF masks pad positions with a large negative bias
        mask = (tokens != 0).astype(jnp.float32)
        bias = bias + (1.0 - mask)[:, None, None, :] * -1e9
        for i in range(self.layers):
            x = T5Block(self.d_model, self.heads, self.d_kv, self.d_ff,
                        dtype=self.dtype, name=f"block_{i}")(x, bias)
        return T5RMSNorm(dtype=self.dtype, name="final_layer_norm")(x)


def byt5_tokenize(texts: List[str], max_length: int = 77) -> np.ndarray:
    """Exact ByT5Tokenizer semantics: UTF-8 bytes + 3 (pad 0 / eos 1 / unk 2),
    truncate to max_length-1, append EOS, pad with 0."""
    out = np.zeros((len(texts), max_length), dtype=np.int32)
    for i, t in enumerate(texts):
        ids = [b + 3 for b in t.encode("utf-8")][: max_length - 1] + [1]
        out[i, : len(ids)] = ids
    return out


def convert_t5_encoder(sd, layers: Optional[int] = None):
    """HF T5EncoderModel state_dict -> flax params."""
    import re

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    n = layers or (1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"encoder\.block\.(\d+)\.", k))))
    params = {
        "shared": {"embedding": sd.get("shared.weight",
                                       sd.get("encoder.embed_tokens.weight"))},
        "relative_attention_bias": sd[
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"],
        "final_layer_norm": {
            "weight": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(n):
        p = f"encoder.block.{i}.layer"
        params[f"block_{i}"] = {
            "ln_attn": {"weight": sd[f"{p}.0.layer_norm.weight"]},
            "attn": {
                "q": {"kernel": sd[f"{p}.0.SelfAttention.q.weight"].T},
                "k": {"kernel": sd[f"{p}.0.SelfAttention.k.weight"].T},
                "v": {"kernel": sd[f"{p}.0.SelfAttention.v.weight"].T},
                "o": {"kernel": sd[f"{p}.0.SelfAttention.o.weight"].T},
            },
            "ln_ff": {"weight": sd[f"{p}.1.layer_norm.weight"]},
            "wi_0": {"kernel": sd[f"{p}.1.DenseReluDense.wi_0.weight"].T},
            "wi_1": {"kernel": sd[f"{p}.1.DenseReluDense.wi_1.weight"].T},
            "wo": {"kernel": sd[f"{p}.1.DenseReluDense.wo.weight"].T},
        }
    return params
