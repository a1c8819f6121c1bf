"""Opt-in int8 W8A8 matmul/conv path (inference-only).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate.  After round 3
proved the exact-bf16 program is within ~10% of its hardware floor
(docs/PERF_r3.md sections 5, 6, 9), quantization is the one remaining
per-chip lever — it changes arithmetic vs the reference's fp16 eager path
(sgm UNet forwards), so like the int8-QK^T attention path it is strictly
OPT-IN and the shipped default stays exact bf16.

Scheme (standard dynamic W8A8, no calibration data needed):
  * weights: symmetric per-output-channel scales (max|w| over the reduce
    axes), quantized in-graph — the cast reads the weight once, negligible
    next to the conv/matmul it feeds;
  * dense activations: symmetric per-token (per last-axis row) scales,
    which fold exactly into the output rows;
  * conv activations: symmetric per-tensor scale (per-pixel scales cannot
    fold exactly through a 3x3 window);
  * accumulate int32 on the MXU, rescale in fp32, add bias, cast back.

Enable with ``CCEDIT_QUANT_MATMUL=1`` (dense/conv only) or the umbrella
``CCEDIT_INT8=1`` (also turns on the attention int8-QK^T path in
ops/attention.py).  Inference-only: jnp.round has zero gradient a.e., so
the trainer refuses to run with the flag set.

``QConv`` / ``QDense`` are drop-in replacements for ``nn.Conv`` /
``nn.Dense`` with IDENTICAL parameter trees ('kernel'/'bias', same shapes,
same default inits) — checkpoint converters and torch-parity tests see no
difference, and with quantization disabled they compute the same lax ops in
the same order (bit-identical; pinned by tests/test_quant.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype
from jax import lax

Dtype = Any

_STATE = {"matmul": None}


def set_quantized_matmul(enabled: bool) -> None:
    _STATE["matmul"] = bool(enabled)


def quantized_matmul_enabled() -> bool:
    if _STATE["matmul"] is None:
        _STATE["matmul"] = (
            os.environ.get("CCEDIT_QUANT_MATMUL", "") not in ("", "0")
            or os.environ.get("CCEDIT_INT8", "") not in ("", "0")
        )
    return _STATE["matmul"]


def _symmetric_q(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize to int8 with symmetric dynamic scales over ``axes``.

    Returns (q, scale) with x ~= q * scale.  scale keeps the reduced axes as
    size-1 dims.  Zero slices (e.g. the zero-materialized bench weights) get
    scale 1 instead of 0/0.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x (..., C) @ kernel (C, F) with dynamic int8 quantization.

    Per-token activation scales and per-column weight scales fold exactly
    into the fp32 rescale; only the int8 rounding itself is approximate.
    """
    xq, sx = _symmetric_q(x, axes=(-1,))          # sx: (..., 1)
    wq, sw = _symmetric_q(kernel, axes=(0,))      # sw: (1, F)
    out = lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.float32) * sx * sw[0]


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int],
    padding: Union[str, Sequence[Tuple[int, int]]],
    dimension_numbers,
) -> jnp.ndarray:
    """Channels-last conv with dynamic int8 quantization (per-tensor
    activation scale, per-output-channel weight scales)."""
    xq, sx = _symmetric_q(x, axes=tuple(range(x.ndim)))
    wq, sw = _symmetric_q(kernel, axes=tuple(range(kernel.ndim - 1)))
    out = lax.conv_general_dilated(
        xq, wq, window_strides=tuple(strides), padding=padding,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.float32) * sx.reshape(()) * sw.reshape(-1)


def _conv_dim_numbers(ndim: int):
    """channels-last dimension numbers for 1D/2D/3D convs, matching flax's
    _conv_dimension_numbers (batch, spatial..., feature)."""
    spatial = "DHW"[3 - (ndim - 2):]
    lhs = "N" + spatial + "C"
    rhs = spatial + "IO"
    return lhs, rhs, lhs


class QConv(nn.Module):
    """Drop-in for nn.Conv (channels-last, groups=1): identical param tree
    and, with quantization off, identical math.  With
    ``quantized_matmul_enabled()`` the conv runs int8 W8A8 on the MXU."""

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        ksize = tuple(self.kernel_size)
        assert x.ndim == len(ksize) + 2, (x.shape, ksize)
        kernel = self.param(
            "kernel", self.kernel_init, (*ksize, x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        strides = self.strides or (1,) * len(ksize)
        dn = lax.conv_dimension_numbers(
            x.shape, kernel.shape, _conv_dim_numbers(x.ndim))
        if quantized_matmul_enabled():
            y = int8_conv(x, kernel, strides, self.padding, dn).astype(x.dtype)
        else:
            y = lax.conv_general_dilated(
                x, kernel, window_strides=tuple(strides), padding=self.padding,
                dimension_numbers=dn)
        if bias is not None:
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y


class QDense(nn.Module):
    """Drop-in for nn.Dense: identical param tree; int8 W8A8 when enabled."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        if quantized_matmul_enabled():
            y = int8_matmul(x, kernel).astype(x.dtype)
        else:
            y = lax.dot_general(
                x, kernel,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y
