"""Chunk-pipelined annotator execution (conditioning/annotators/chunked.py).

Contracts under test:
  * chunked backbone + single clip-global postprocess == single-shot result
    (the backbone's frame axis is a batch axis; MiDaS postprocess normalizes
    over the WHOLE clip, modules.py:1367-1383 — chunking must not change it);
  * ragged tail chunks are handled;
  * load_video_keyframes(out_dtype='uint8') returns the decoders' native
    uint8 pixels (no float round-trip) that quantize-match the float path.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def tiny_dpt():
    from ccedit_tpu.conditioning.annotators.dpt_midas import DPTHybrid

    return DPTHybrid(
        embedding_size=16, bit_hidden=(16, 32, 64), bit_depths=(1, 1, 1),
        num_groups=4, hidden_size=32, num_layers=2, num_heads=2,
        mlp_dim=64, vit_taps=(0, 1), fusion_hidden=16, pos_grid=4,
    )


class TestChunkedAnnotator:
    @pytest.mark.parametrize("chunk", [2, 3, 7])
    @pytest.mark.slow
    def test_matches_single_shot(self, chunk):
        import jax

        from ccedit_tpu.conditioning.annotators.base import midas_postprocess
        from ccedit_tpu.conditioning.annotators.chunked import chunked_depth_hint

        dpt = tiny_dpt()
        rng = jax.random.PRNGKey(0)
        frames_u8 = np.asarray(
            jax.random.randint(rng, (7, 64, 64, 3), 0, 256, jnp.int32),
            dtype=np.uint8)
        params = dpt.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))

        # single-shot oracle, fp32 end to end
        frames = jnp.asarray(frames_u8, jnp.float32) / 127.5 - 1.0
        depth = dpt.apply(params, frames)
        ref = midas_postprocess(depth.astype(jnp.float32))

        hint = chunked_depth_hint(dpt, chunk=chunk, dtype=jnp.float32)(
            params, frames_u8)
        assert hint.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(hint, np.float32), np.asarray(ref, np.float32),
            atol=2e-5, rtol=1e-4)

    def test_generic_no_postprocess(self):
        import jax

        from ccedit_tpu.conditioning.annotators.chunked import ChunkedAnnotator

        def backbone(p, u8):
            return u8.astype(jnp.float32) * p["scale"]

        ann = ChunkedAnnotator(backbone, postprocess=None, chunk=4)
        x = np.arange(10 * 2 * 2 * 3, dtype=np.uint8).reshape(10, 2, 2, 3)
        out = ann({"scale": jnp.float32(2.0)}, x)
        np.testing.assert_allclose(np.asarray(out), x.astype(np.float32) * 2.0)


class TestUint8Loader:
    def test_uint8_matches_float_quantized(self, tmp_path):
        from ccedit_tpu.data.video import load_video_keyframes, save_video_frames

        rng = np.random.default_rng(0)
        # smooth content so codec loss stays small but nonzero either way
        t = np.linspace(0, 1, 9)[:, None, None, None]
        yy = np.linspace(-1, 1, 32)[None, :, None, None]
        xx = np.linspace(-1, 1, 48)[None, None, :, None]
        clip = np.clip(0.6 * np.sin(3 * xx + 2 * t) + 0.4 * yy, -1, 1)
        clip = np.repeat(clip, 3, axis=-1).astype(np.float32)
        path = str(tmp_path / "clip.mp4")
        save_video_frames(clip, path, fps=8.0)

        f32 = load_video_keyframes(path, origin_fps=8, target_fps=4,
                                   num_keyframes=4, size_hw=(32, 48))
        u8 = load_video_keyframes(path, origin_fps=8, target_fps=4,
                                  num_keyframes=4, size_hw=(32, 48),
                                  out_dtype="uint8")
        assert u8.dtype == np.uint8 and u8.shape == (4, 32, 48, 3)
        # same pixels modulo the [-1,1] quantization contract
        re_f32 = u8.astype(np.float32) / 127.5 - 1.0
        assert np.max(np.abs(re_f32 - f32)) < 1.0 / 127.5 + 1e-6


class TestUint8Embedders:
    def test_identity_dequantizes_uint8(self):
        from ccedit_tpu.conditioning.embedders import IdentityEncoder

        x = np.arange(24, dtype=np.uint8).reshape(1, 2, 2, 2, 3)
        out = IdentityEncoder().embed(None, x)
        np.testing.assert_allclose(
            np.asarray(out), x.astype(np.float32) / 127.5 - 1.0)

    def test_annotator_eager_chunked_matches_traced(self):
        """Eager numpy-uint8 input takes the chunk-pipelined host path; it
        must match the pure jittable path on dequantized floats exactly."""
        import jax

        from ccedit_tpu.conditioning.annotators.base import AnnotatorEmbedder

        dpt = tiny_dpt()
        rng = jax.random.PRNGKey(3)
        params = dpt.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
        emb = AnnotatorEmbedder(
            "depth_midas",
            backbone=lambda p, fr: dpt.apply(p, fr),
            backbone_params=params,
        )

        video_u8 = np.asarray(
            jax.random.randint(rng, (1, 7, 64, 64, 3), 0, 256, jnp.int32),
            dtype=np.uint8)
        out_host = emb.embed(None, video_u8)

        video_f = jnp.asarray(video_u8, jnp.float32) / 127.5 - 1.0
        out_traced = emb.embed(None, video_f)
        np.testing.assert_allclose(
            np.asarray(out_host, np.float32),
            np.asarray(out_traced, np.float32), atol=2e-5, rtol=1e-4)

        # memo: the sampling CLI passes the identical array for batch_uc —
        # the second pass must reuse the hint, not re-run the backbone
        assert emb.embed(None, video_u8) is out_host

    def test_hint_memo_interleaved_videos(self):
        """BalanceCC job lists interleave prompts over a few videos; the
        hint cache must hit across jobs (array identity), not just for the
        immediately preceding clip."""
        import jax

        from ccedit_tpu.conditioning.annotators.base import AnnotatorEmbedder

        dpt = tiny_dpt()
        rng = jax.random.PRNGKey(5)
        params = dpt.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
        calls = {"n": 0}

        def backbone(p, fr):
            calls["n"] += 1
            return dpt.apply(p, fr)

        emb = AnnotatorEmbedder("depth_midas", backbone=backbone,
                                backbone_params=params)
        vids = [
            np.asarray(jax.random.randint(
                jax.random.PRNGKey(i), (1, 4, 64, 64, 3), 0, 256, jnp.int32),
                dtype=np.uint8)
            for i in range(3)
        ]
        outs = [emb.embed(None, v) for v in vids]
        first_calls = calls["n"]
        assert first_calls > 0
        # interleaved repeats: all must hit the cache
        for i in (0, 2, 1, 0):
            assert emb.embed(None, vids[i]) is outs[i]
        assert calls["n"] == first_calls

    def test_engine_encode_accepts_uint8(self):
        import jax

        from ccedit_tpu.utils.misc import as_float_frames

        x = np.asarray(
            jax.random.randint(jax.random.PRNGKey(0), (2, 4, 4, 3), 0, 256,
                               jnp.int32), dtype=np.uint8)
        out = as_float_frames(x)
        assert out.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6
        # float passthrough is untouched
        f = jnp.ones((2, 3), jnp.bfloat16)
        assert as_float_frames(f) is f
