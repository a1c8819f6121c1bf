"""Conditioner routing / ucg / tokenizer / annotator post-processing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccedit_tpu.conditioning.annotators.base import (
    midas_postprocess,
    zoe_postprocess,
    AnnotatorEmbedder,
)
from ccedit_tpu.conditioning.conditioner import Conditioner, EmbedderSpec
from ccedit_tpu.conditioning.embedders import (
    ConcatTimestepEmbedderND,
    IdentityEncoder,
    InpaintingEncoder,
)
from ccedit_tpu.conditioning.tokenizer import BOS, EOS, HashTokenizer


class TestConditionerRouting:
    def test_key_routing_and_concat(self):
        cond = Conditioner([
            EmbedderSpec(embedder=IdentityEncoder(), input_key="txt_emb", out_key="crossattn"),
            EmbedderSpec(embedder=IdentityEncoder(), input_key="more_tokens", out_key="crossattn"),
            EmbedderSpec(embedder=IdentityEncoder(), input_key="control_hint"),
            EmbedderSpec(embedder=IdentityEncoder(), input_key="vec"),
        ])
        batch = {
            "txt_emb": jnp.ones((1, 7, 8)),
            "more_tokens": jnp.ones((1, 7, 4)),
            "control_hint": jnp.ones((1, 2, 4, 4, 3)),
            "vec": jnp.ones((1, 6)),
        }
        out = cond.embed({}, batch)
        # reference concatenates crossattn on the feature dim (KEY2CATDIM=2)
        assert out["crossattn"].shape == (1, 7, 12)
        assert out["control_hint"].shape == (1, 2, 4, 4, 3)
        assert out["vector"].shape == (1, 6)  # ndim-2 routing

    def test_ucg_dropout_zeroes_rows(self):
        spec = EmbedderSpec(embedder=IdentityEncoder(), input_key="x", out_key="crossattn", ucg_rate=1.0)
        cond = Conditioner([spec])
        batch = {"x": jnp.ones((4, 3, 2))}
        out = cond.embed({}, batch, rng=jax.random.PRNGKey(0), apply_ucg=True)
        np.testing.assert_allclose(np.asarray(out["crossattn"]), 0.0)

    def test_unconditional_pair(self):
        cond = Conditioner([
            EmbedderSpec(embedder=IdentityEncoder(), input_key="x", out_key="crossattn", ucg_rate=0.5),
        ])
        c, uc = cond.get_unconditional_conditioning(
            {}, {"x": jnp.ones((2, 3, 2))}, {"x": jnp.zeros((2, 3, 2))}
        )
        np.testing.assert_allclose(np.asarray(c["crossattn"]), 1.0)  # no ucg applied
        np.testing.assert_allclose(np.asarray(uc["crossattn"]), 0.0)


class TestTokenizer:
    def test_hash_tokenizer_shape_and_specials(self):
        tok = HashTokenizer()
        out = tok(["hello world", ""])
        assert out.shape == (2, 77)
        assert out[0, 0] == BOS and out[0, 3] == EOS
        assert out[1, 1] == EOS

    def test_clip_bpe_with_synthetic_vocab(self, tmp_path):
        import json

        from ccedit_tpu.conditioning.tokenizer import ClipTokenizer, bytes_to_unicode

        # build a minimal vocab: all byte tokens + </w> forms + two merges
        base = list(bytes_to_unicode().values())
        vocab = {}
        for v in base:
            vocab[v] = len(vocab)
        for v in base:
            vocab[v + "</w>"] = len(vocab)
        for extra in ["he", "lo</w>", "llo</w>", "<|startoftext|>", "<|endoftext|>"]:
            vocab[extra] = len(vocab)
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text("#version\nh e\nl o</w>\nl lo</w>\n")
        tok = ClipTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
        ids = tok.encode("hello")
        # 'hello' -> (h e)->'he', (l o</w>)->'lo</w>', (l lo</w>)->'llo</w>'
        assert ids == [vocab["he"], vocab["llo</w>"]]


class TestAnnotators:
    def test_midas_postprocess_range_and_negation(self):
        d = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8))
        out = midas_postprocess(d)
        assert out.shape == (2, 8, 8, 3)
        assert float(out.max()) <= 1.0 and float(out.min()) >= -1.0
        # nearest point (max depth value) maps to -1 (negated)
        idx = np.unravel_index(np.argmax(np.asarray(d)), d.shape)
        assert np.asarray(out)[idx + (0,)] == pytest.approx(-1.0)

    def test_zoe_postprocess_percentiles(self):
        d = jnp.asarray(np.random.RandomState(1).rand(4, 8, 8).astype(np.float32))
        out = zoe_postprocess(d, batch=2)
        assert out.shape == (4, 8, 8, 3)
        assert float(out.max()) <= 1.0 and float(out.min()) >= -1.0

    def test_gradient_pseudo_depth_annotator_runs(self):
        # pseudo-depth is opt-in (allow_fake) since the real DPT backbone
        # landed; see test_depth_parity.TestAnnotatorGating for the gating
        ann = AnnotatorEmbedder("depth_midas", allow_fake=True)
        x = jnp.asarray(np.random.RandomState(2).rand(1, 2, 16, 16, 3) * 2 - 1)
        out = ann.embed(None, x)
        assert out.shape == (1, 2, 16, 16, 3)

    def test_lineart_standard(self):
        from ccedit_tpu.conditioning.annotators.lineart import lineart_standard_jnp

        x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3) * 2 - 1)
        out = lineart_standard_jnp(x)
        assert out.shape == (2, 32, 32, 3)
        assert float(out.max()) <= 1.0 and float(out.min()) >= -1.0


class TestMiscEmbedders:
    def test_concat_timestep_embedder(self):
        e = ConcatTimestepEmbedderND(outdim=8)
        out = e.embed(None, jnp.asarray([[1.0, 2.0], [3.0, 4.0]]))
        assert out.shape == (2, 16)

    def test_inpainting_mask_blackens_region(self):
        # reference semantics: kept = -(x+1)/2, hole = +1 (modules.py:2330-2336)
        e = InpaintingEncoder(seed=0)
        x = np.ones((1, 2, 16, 16, 3), dtype=np.float32)
        masked = e.prepare(x)
        assert masked.min() == -1.0  # kept region of an all-ones clip
        assert (masked == 1.0).any()  # the hole


class TestLowScaleEncoder:
    def test_qsample_noise_aug_and_rescale(self):
        from ccedit_tpu.conditioning.embedders import LowScaleEncoder

        e = LowScaleEncoder(max_noise_level=250, out_size=8, scale_factor=0.18,
                            seed=0)
        x = np.ones((2, 16, 16, 3), dtype=np.float32)
        noised = e.prepare(x)
        assert noised.shape == x.shape
        assert e.last_noise_level.shape == (2,)
        assert (e.last_noise_level < 250).all()
        out = e.embed(None, noised)
        assert out.shape == (2, 8, 8, 3)


class TestPiDiNetEncoders:
    """SoftEdge / ScribblePidiNet encoder semantics (modules.py:1405-1446,
    1655-1708): fused sigmoid edge -> (1 - edge) -> [-1, 1] -> 3ch."""

    def _params(self):
        import jax

        from ccedit_tpu.conditioning.annotators.pidinet import PiDiNet

        model = PiDiNet(inplane=6, dil=4)
        x = jnp.zeros((1, 16, 16, 3))
        return model, jax.random.split(jax.random.PRNGKey(0), 1)[0], x

    @pytest.mark.slow
    def test_softedge_mapping(self):
        import jax

        from ccedit_tpu.conditioning.annotators.pidinet import PiDiNet

        model = PiDiNet(inplane=6, dil=4)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
            "params"
        ]
        ann = AnnotatorEmbedder("softedge_pidinet", backbone_params=params)
        ann._model = model  # small test-sized net instead of table5 dims
        import ccedit_tpu.conditioning.annotators.base as base_mod

        # route through the real embed() with a patched detector size
        from ccedit_tpu.conditioning.annotators import pidinet as pidi_mod

        orig = pidi_mod.PiDiNet
        pidi_mod.PiDiNet = lambda: orig(inplane=6, dil=4)
        try:
            x = jnp.asarray(np.random.RandomState(5).rand(1, 2, 16, 16, 3) * 2 - 1)
            out = ann.embed(None, x)
        finally:
            pidi_mod.PiDiNet = orig
        assert out.shape == (1, 2, 16, 16, 3)
        o = np.asarray(out)
        assert o.min() >= -1.0 and o.max() <= 1.0
        # all three channels identical (repeat of the 1-channel edge)
        np.testing.assert_allclose(o[..., 0], o[..., 1])

    def test_safe_step_quantizes(self):
        from ccedit_tpu.conditioning.annotators.pidinet import safe_step

        x = jnp.asarray([0.0, 0.2, 0.4, 0.6, 0.9, 1.0])
        y = np.asarray(safe_step(x, 2))
        assert set(np.round(y, 3)) <= {0.0, 0.5, 1.0, 1.5}

    def test_scribble_postprocess_binarizes(self):
        pytest.importorskip("cv2")
        from ccedit_tpu.conditioning.annotators.scribble import (
            scribble_postprocess,
        )

        edge = np.zeros((1, 32, 32), np.float32)
        edge[0, 12:20, 4:28] = 1.0  # a thick bright stripe survives the blur
        out = scribble_postprocess(edge)
        assert out.shape == (1, 32, 32)
        assert set(np.unique(out)) <= {0.0, 1.0}
        assert out.sum() > 0


class TestOpenposeAssembly:
    """Host-side peak finding + PAF limb matching + subset merge on synthetic
    maps (semantics of modules.py:2090-2297)."""

    def _synthetic(self, H=64, W=64):
        # two keypoints: part 1 (neck, idx 1) at (16,32), part 2 (r-shoulder,
        # idx 2... limb [2,3] links parts idx1->idx2) at (48,32)
        heat = np.zeros((H, W, 19), np.float32)
        yy, xx = np.mgrid[0:H, 0:W]

        def blob(cx, cy):
            return np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 18.0)

        heat[:, :, 1] = blob(16, 32)   # part 2 in 1-based = "neck"
        heat[:, :, 2] = blob(48, 32)   # part 3 in 1-based
        paf = np.zeros((H, W, 38), np.float32)
        # limb k=0 is [2,3] with mapIdx [31,32] -> paf channels 12,13
        paf[28:37, 12:53, 12] = 1.0  # unit x-direction field along the limb
        return heat, paf

    def test_two_joint_limb_is_assembled(self):
        from ccedit_tpu.conditioning.annotators.openpose import (
            assemble_limbs,
            find_peaks,
            merge_subsets,
        )

        heat, paf = self._synthetic()
        peaks = find_peaks(heat)
        assert len(peaks[1]) == 1 and len(peaks[2]) == 1
        assert peaks[1][0][:2] == (16, 32)
        conns, special = assemble_limbs(peaks, paf, 64)
        assert len(conns[0]) == 1  # the [2,3] limb connected
        candidate, subset = merge_subsets(peaks, conns, special)
        # a 2-part person is below the >=4 parts cut; relax by checking the
        # pre-filter path instead: candidate holds both peaks
        assert candidate.shape[0] == 2

    def test_draw_bodypose_renders(self):
        pytest.importorskip("cv2")
        from ccedit_tpu.conditioning.annotators.openpose import draw_bodypose

        candidate = np.array([[0.25, 0.5, 0.9, 0], [0.75, 0.5, 0.8, 1]])
        subset = -1 * np.ones((1, 20))
        subset[0, 1] = 0  # part 2 (neck)
        subset[0, 2] = 1  # part 3
        subset[0, -1] = 2
        canvas = draw_bodypose(np.zeros((64, 64, 3), np.uint8), candidate, subset)
        assert canvas.sum() > 0


class TestSafetyAndWatermark:
    def test_watermark_lsb_roundtrip(self):
        from ccedit_tpu.utils.watermark import (
            WATERMARK_BITS,
            WatermarkEmbedder,
            decode_lsb,
        )

        img = np.random.RandomState(0).rand(1, 32, 64, 3).astype(np.float32)
        out = WatermarkEmbedder()(img)
        assert out.shape == img.shape
        assert decode_lsb(out) == WATERMARK_BITS
        # perturbation is at most 1 LSB of the blue channel
        assert np.abs(out - img).max() <= (1.5 / 255.0)

    def test_safety_filter_passthrough_and_blur(self):
        import jax.numpy as jnp

        from ccedit_tpu.utils.safety import (
            DeepFloydDataFiltering,
            gaussian_blur,
            clip_process_images,
        )

        imgs = jnp.asarray(np.random.RandomState(1).rand(2, 64, 48, 3),
                           jnp.float32)
        filt = DeepFloydDataFiltering()  # no weights -> passthrough + warning
        np.testing.assert_allclose(np.asarray(filt(imgs)), np.asarray(imgs))
        proc = clip_process_images(imgs)
        assert proc.shape == (2, 224, 224, 3)
        blurred = gaussian_blur(imgs)
        assert blurred.shape == imgs.shape
        # heavy blur flattens the image toward its mean
        assert float(jnp.std(blurred)) < float(jnp.std(imgs)) * 0.5

    def test_downcond_appends_factor_channels(self):
        from ccedit_tpu.conditioning.embedders import (
            CustomIdentityDownCondEncoder,
        )

        e = CustomIdentityDownCondEncoder(outdim=8, down_blur_factor=[2.0],
                                          down_blur_probs=[1.0])
        x = np.random.RandomState(2).rand(2, 3, 16, 16, 4).astype(np.float32)
        out = e.embed(None, x)
        assert out.shape == (2, 3, 16, 16, 12)

    def test_down_blur_rerandomizes_under_jit(self):
        """The blur factor must be drawn from the traced rng — one compiled
        step with different keys sees different factors (a host-RNG draw
        would freeze at trace time; ADVICE r2 medium)."""
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.embedders import (
            CustomIdentityDownCondEncoder,
        )

        e = CustomIdentityDownCondEncoder(
            outdim=8, down_blur_factor=[1.0, 4.0], down_blur_probs=[0.5, 0.5])
        x = jnp.asarray(
            np.random.RandomState(3).rand(1, 2, 16, 16, 4), jnp.float32)

        @jax.jit
        def step(key):
            out = e.embed(None, x, rng=key)
            # factor round-trips through the Fourier channels; the blurred
            # content differs between factors — compare data channels
            return out[..., :4]

        outs = [np.asarray(step(jax.random.PRNGKey(s))) for s in range(8)]
        identity = [np.allclose(o, np.asarray(x), atol=1e-6) for o in outs]
        # with p=0.5 over 8 draws both branches appear (p_miss = 2*0.5^8)
        assert any(identity) and not all(identity)

    def test_vae_embedder_blur_traced(self):
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.embedders import VAEEmbedder

        e = VAEEmbedder(vae_apply=lambda x: x,
                        down_blur_factor=[1.0, 4.0],
                        down_blur_probs=[0.5, 0.5])
        x = jnp.asarray(
            np.random.RandomState(4).rand(1, 16, 16, 4), jnp.float32)

        @jax.jit
        def step(key):
            return e.embed(None, x, rng=key)

        outs = [np.asarray(step(jax.random.PRNGKey(s))) for s in range(8)]
        identity = [np.allclose(o, np.asarray(x), atol=1e-6) for o in outs]
        assert any(identity) and not all(identity)
        # eager path (no rng) still works via the host RNG
        assert e.embed(None, x).shape == x.shape

    def test_detect_watermark_cli_roundtrip(self, tmp_path):
        from PIL import Image

        from ccedit_tpu.cli.detect_watermark import detect
        from ccedit_tpu.utils.watermark import WatermarkEmbedder

        img = np.random.RandomState(3).rand(1, 32, 64, 3).astype(np.float32)
        marked = WatermarkEmbedder()(img)
        p_clean = tmp_path / "clean.png"
        p_marked = tmp_path / "marked.png"
        Image.fromarray((img[0] * 255).astype(np.uint8)).save(p_clean)
        Image.fromarray(np.round(marked[0] * 255).astype(np.uint8)).save(p_marked)
        assert detect(str(p_marked))
        assert not detect(str(p_clean))
