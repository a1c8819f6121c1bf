"""Pallas kernel semantics (interpret mode on CPU) vs plain-XLA attention."""

import numpy as np

import jax
import jax.numpy as jnp

from ccedit_tpu.ops.attention import dot_product_attention
from ccedit_tpu.ops.temporal_attention import small_seq_attention


class TestSmallSeqAttention:
    def test_matches_reference_math(self):
        rng = np.random.RandomState(0)
        q = rng.randn(6, 2, 5, 8).astype(np.float32)
        k = rng.randn(6, 2, 5, 8).astype(np.float32)
        v = rng.randn(6, 2, 5, 8).astype(np.float32)
        s = np.einsum("bhqd,bhkd->bhqk", q, k) * 8 ** -0.5
        w = np.exp(s - s.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bhkd->bhqd", w, v)
        out = small_seq_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), 8 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)

    def test_lane_padding_roundtrip(self):
        # batch*heads not a multiple of the 512-lane block exercises padding
        q = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 4, 8))
        out = small_seq_attention(q, q, q, 8 ** -0.5)
        ref = dot_product_attention(q, q, q, force_xla=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


# (a TestSmallKVAttention suite existed briefly in round 3; the kernel lost
# to XLA on device — 4.7 vs 2.3 ms — and was removed with its tests.
# docs/PERF_r3.md §6 records the measurements.)

