"""OpenCLIP text + vision transformers (ViT-H/14 family), from scratch.

Behavioural parity targets (sgm/modules/encoders/modules.py):
  * FrozenOpenCLIPEmbedder   (:526-598) — text tower, layer last/penultimate;
    'penultimate' stops BEFORE the final resblock and then applies ln_final.
  * FrozenOpenCLIPEmbedder2  (:423-523) — runs all layers, returns the chosen
    hidden state; legacy mode applies ln_final to it, non-legacy also returns
    the EOT-pooled projection computed from the LAST layer.
  * FrozenOpenCLIPImageEmbedder (:601-758) — vision tower, cls-token pooling,
    optional patch-token output.

Architecture is open_clip's (gelu MLP, fused qkv attention, pre-norm
resblocks, causal text mask); layout is channels-last flax with the shared
attention dispatch (ops.attention).  Weight layout converters accept
open_clip checkpoints (in_proj_weight fused qkv, visual.* tree).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    """open_clip transformer resblock: pre-LN, fused-qkv MHA, gelu MLP.
    act='quick_gelu' selects OpenAI-CLIP's x*sigmoid(1.702x) MLP."""

    width: int
    heads: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = q.shape
        d = self.width // self.heads

        def split(t):
            return t.reshape(b, l, self.heads, d).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        if mask is not None:
            logits = logits + mask
        weights = nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
        if self.act == "quick_gelu":
            h = h * nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class OpenCLIPTextModel(nn.Module):
    """Text tower.  ViT-H-14 text defaults: width 1024, 24 layers, 16 heads."""

    vocab_size: int = 49408
    max_len: int = 77
    width: int = 1024
    heads: int = 16
    layers: int = 24
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 skip_last_layer: bool = False) -> Dict[str, jnp.ndarray]:
        """Returns hidden states: 'penultimate' (input of the final resblock,
        NOT normalized — modules.py:509-511), 'last' (after all resblocks,
        NOT normalized), 'last_norm' (ln_final(last)), 'pooled' (EOT position
        of last_norm @ text_projection).  With skip_last_layer=True the final
        resblock is neither run nor traced ('last*'/'pooled' then absent) —
        the FrozenOpenCLIPEmbedder 'penultimate' fast path."""
        b, l = tokens.shape
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.max_len, self.width))
        x = x + pos[None, :l].astype(x.dtype)
        mask = jnp.triu(jnp.full((l, l), -np.inf, dtype=jnp.float32), k=1)[None, None]

        out: Dict[str, jnp.ndarray] = {}
        n_run = self.layers - 1 if skip_last_layer else self.layers
        for i in range(n_run):
            if i == self.layers - 1:
                out["penultimate"] = x
            x = ResidualAttentionBlock(self.width, self.heads, dtype=self.dtype,
                                       name=f"resblocks_{i}")(x, mask)
        if skip_last_layer:
            out["penultimate"] = x
            out["penultimate_norm"] = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
            return out
        out["last"] = x
        final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        out["last_norm"] = final
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (self.width, self.width))
        eot = jnp.argmax(tokens, axis=-1)  # EOT token has the highest id
        out["pooled"] = final[jnp.arange(b), eot] @ proj.astype(final.dtype)
        return out


class OpenCLIPVisionModel(nn.Module):
    """Vision tower.  ViT-H-14 defaults: 14px patches, width 1280, 32 layers,
    16 heads, output dim 1024."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32
    output_dim: int = 1024
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, output_tokens: bool = False):
        """images: (B, H, W, 3) CLIP-normalized.  Returns pooled (B, out_dim)
        or (pooled, tokens (B, N, width)) with output_tokens."""
        b = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        x = x.reshape(b, -1, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.01),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x], axis=1)
        n_tok = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (n_tok, self.width))
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, act=self.act,
                                       dtype=self.dtype,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        proj = self.param("proj", nn.initializers.normal(0.01),
                          (self.width, self.output_dim))
        pooled = pooled @ proj.astype(pooled.dtype)
        if output_tokens:
            return pooled, tokens
        return pooled


# ---------------------------------------------------------------------------
# weight conversion: open_clip state_dict -> flax params
# ---------------------------------------------------------------------------

def _resblock_params(sd, prefix: str) -> Dict:
    w = lambda k: np.asarray(sd[f"{prefix}.{k}"], np.float32)
    return {
        "ln_1": {"scale": w("ln_1.weight"), "bias": w("ln_1.bias")},
        "in_proj": {"kernel": w("attn.in_proj_weight").T,
                    "bias": w("attn.in_proj_bias")},
        "out_proj": {"kernel": w("attn.out_proj.weight").T,
                     "bias": w("attn.out_proj.bias")},
        "ln_2": {"scale": w("ln_2.weight"), "bias": w("ln_2.bias")},
        "c_fc": {"kernel": w("mlp.c_fc.weight").T, "bias": w("mlp.c_fc.bias")},
        "c_proj": {"kernel": w("mlp.c_proj.weight").T,
                   "bias": w("mlp.c_proj.bias")},
    }


def convert_openclip_text(sd: Dict[str, np.ndarray], layers: int) -> Dict:
    """open_clip CLIP text tower (token_embedding, positional_embedding,
    transformer.resblocks.N.*, ln_final, text_projection) -> flax."""
    params: Dict = {
        "token_embedding": {
            "embedding": np.asarray(sd["token_embedding.weight"], np.float32)},
        "positional_embedding": np.asarray(sd["positional_embedding"], np.float32),
        "ln_final": {"scale": np.asarray(sd["ln_final.weight"], np.float32),
                     "bias": np.asarray(sd["ln_final.bias"], np.float32)},
    }
    if "text_projection" in sd:
        params["text_projection"] = np.asarray(sd["text_projection"], np.float32)
    for i in range(layers):
        key = f"transformer.resblocks.{i}"
        if f"{key}.ln_1.weight" not in sd:
            break
        params[f"resblocks_{i}"] = _resblock_params(sd, key)
    return params


def convert_openclip_vision(sd: Dict[str, np.ndarray], layers: int) -> Dict:
    """open_clip visual tower (visual.* or bare) -> flax."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    params: Dict = {
        "conv1": {"kernel": np.transpose(
            np.asarray(sd["conv1.weight"], np.float32), (2, 3, 1, 0))},
        "class_embedding": np.asarray(sd["class_embedding"], np.float32),
        "positional_embedding": np.asarray(sd["positional_embedding"], np.float32),
        "ln_pre": {"scale": np.asarray(sd["ln_pre.weight"], np.float32),
                   "bias": np.asarray(sd["ln_pre.bias"], np.float32)},
        "ln_post": {"scale": np.asarray(sd["ln_post.weight"], np.float32),
                    "bias": np.asarray(sd["ln_post.bias"], np.float32)},
        "proj": np.asarray(sd["proj"], np.float32),
    }
    for i in range(layers):
        params[f"resblocks_{i}"] = _resblock_params(sd, f"transformer.resblocks.{i}")
    return params
