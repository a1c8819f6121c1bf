"""InceptionV3 feature extractor (the FID metric backbone), from scratch.

Behavioural parity target: the reference's ``InceptionV3`` wrapper
(sgm/modules/encoders/modules.py:207-230) around ``pytorch_fid.inception``,
which is torchvision's InceptionV3 with the FID quirks:
  * pool branches in InceptionA/C and the first InceptionE use
    count_include_pad=False average pooling;
  * the second InceptionE (Mixed_7c) uses MAX pooling in its pool branch;
  * optional input resize to 299 (bilinear) and [0,1] -> [-1,1] remap;
  * feature taps after: maxpool1 (64ch), maxpool2 (192ch), Mixed_6e (768ch),
    and the final global average pool (2048ch).

Structure is channels-last flax; BasicConv2d = conv(no bias) + BatchNorm
(inference: running stats, eps 1e-3) + relu.  ``convert_inception`` accepts
the pytorch_fid / torchvision state_dict layout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def avg_pool_nocount(x, window=3):
    """3x3 stride-1 average pool, count_include_pad=False."""
    s = nn.pool(x, 0.0, jax.lax.add, (window, window), (1, 1), "SAME")
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    cnt = nn.pool(ones, 0.0, jax.lax.add, (window, window), (1, 1), "SAME")
    return s / cnt


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, (tuple, list)) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out_ch, tuple(self.kernel), strides=tuple(self.strides),
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (Mixed_7b) or 'max' (FID Mixed_7c)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID feature extractor.  Input (B, H, W, 3); ``normalize_input`` maps
    [0,1] -> [-1,1]; ``resize_input`` bilinear-resizes to 299.  Returns the
    requested feature taps (default: final 2048-d pooled vector, squeezed —
    the reference wrapper's behavior)."""

    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3),
                                 method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        outs: Dict[int, jnp.ndarray] = {}
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs[0] = x
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs[1] = x
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        outs[2] = x
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max", dtype=self.dtype, name="Mixed_7c")(x)
        outs[3] = jnp.mean(x, axis=(1, 2), keepdims=False)[:, None, None, :]
        result = [outs[i] for i in sorted(set(self.output_blocks))]
        if result[-1].shape[1:3] == (1, 1) and 3 in self.output_blocks:
            result[-1] = result[-1][:, 0, 0, :]  # squeeze (reference :228)
        return result


def convert_inception(sd: Dict[str, np.ndarray]) -> Dict:
    """pytorch_fid / torchvision InceptionV3 state_dict -> flax params."""
    params: Dict = {}
    groups = {}
    for k in sd:
        if k.endswith("conv.weight"):
            groups[k[: -len(".conv.weight")]] = True
    for mod in groups:
        parts = mod.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {
            "conv": {"kernel": np.transpose(
                np.asarray(sd[f"{mod}.conv.weight"], np.float32), (2, 3, 1, 0))},
            "bn_scale": np.asarray(sd[f"{mod}.bn.weight"], np.float32),
            "bn_bias": np.asarray(sd[f"{mod}.bn.bias"], np.float32),
            "bn_mean": np.asarray(sd[f"{mod}.bn.running_mean"], np.float32),
            "bn_var": np.asarray(sd[f"{mod}.bn.running_var"], np.float32),
        }
    return params
