"""Parity tests for the T5 and OpenCLIP text/vision encoders.

T5: against HF transformers T5EncoderModel with a tiny random config (the
exact implementation the reference's FrozenT5Embedder wraps,
encoders/modules.py:275-313).  OpenCLIP: against a torch oracle built from
open_clip's resblock definition (nn.MultiheadAttention + gelu MLP), since
open_clip itself is not vendored by the reference either.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestT5Parity:
    def test_encoder_matches_hf(self):
        from transformers import T5Config, T5EncoderModel

        import jax.numpy as jnp

        from ccedit_tpu.modules.t5 import T5Encoder, convert_t5_encoder

        cfg = T5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=3,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=16, dropout_rate=0.0,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        )
        tm = T5EncoderModel(cfg).eval()
        tokens = torch.tensor([[5, 9, 42, 1, 0, 0], [7, 7, 7, 7, 7, 1]])
        with torch.no_grad():
            ref = tm(input_ids=tokens,
                     attention_mask=(tokens != 0).long()).last_hidden_state.numpy()

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        jm = T5Encoder(vocab_size=128, d_model=32, d_kv=8, d_ff=64, heads=4,
                       layers=3, rel_buckets=8, rel_max_distance=16)
        params = convert_t5_encoder(sd)
        out = jm.apply({"params": params}, jnp.asarray(tokens.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)

    def test_byt5_tokenize_exact(self):
        from ccedit_tpu.modules.t5 import byt5_tokenize

        ids = byt5_tokenize(["hi", ""], max_length=6)
        # 'h'=104+3, 'i'=105+3, eos=1, pad=0
        np.testing.assert_array_equal(ids[0], [107, 108, 1, 0, 0, 0])
        np.testing.assert_array_equal(ids[1], [1, 0, 0, 0, 0, 0])

    def test_byt5_tokenize_matches_hf_if_available(self):
        try:
            from transformers import ByT5Tokenizer

            tok = ByT5Tokenizer()
        except Exception:
            pytest.skip("ByT5Tokenizer assets unavailable offline")
        from ccedit_tpu.modules.t5 import byt5_tokenize

        texts = ["hello world", "T5 is char-aware!"]
        ref = tok(texts, truncation=True, max_length=12, padding="max_length",
                  return_tensors="np")["input_ids"]
        np.testing.assert_array_equal(byt5_tokenize(texts, 12), ref)


class _TorchResblock(torch.nn.Module):
    """open_clip ResidualAttentionBlock (gelu MLP, pre-LN, fused-qkv MHA)."""

    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(width)
        self.attn = torch.nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.Sequential()
        self.mlp.add_module("c_fc", torch.nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", torch.nn.GELU())
        self.mlp.add_module("c_proj", torch.nn.Linear(width * 4, width))

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class _TorchOpenCLIPText(torch.nn.Module):
    def __init__(self, vocab, max_len, width, heads, layers):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(torch.randn(max_len, width))
        self.resblocks = torch.nn.ModuleList(
            [_TorchResblock(width, heads) for _ in range(layers)])
        self.ln_final = torch.nn.LayerNorm(width)
        self.text_projection = torch.nn.Parameter(torch.randn(width, width))

    def forward(self, tokens):
        L = tokens.shape[1]
        x = self.token_embedding(tokens) + self.positional_embedding[:L]
        mask = torch.full((L, L), float("-inf")).triu(1)
        outs = {}
        for i, r in enumerate(self.resblocks):
            if i == len(self.resblocks) - 1:
                outs["penultimate"] = x
            x = r(x, attn_mask=mask)
        outs["last"] = x
        final = self.ln_final(x)
        outs["last_norm"] = final
        outs["pooled"] = (final[torch.arange(x.shape[0]),
                                tokens.argmax(dim=-1)] @ self.text_projection)
        return outs


def _state_dict_for_converter(tm):
    sd = {}
    for k, v in tm.state_dict().items():
        k = k.replace("resblocks.", "transformer.resblocks.")
        sd[k] = v.numpy()
    return sd


class TestOpenCLIPTextParity:
    def _build(self):
        import jax.numpy as jnp

        from ccedit_tpu.modules.openclip import (
            OpenCLIPTextModel,
            convert_openclip_text,
        )

        torch.manual_seed(70)
        tm = _TorchOpenCLIPText(64, 16, 32, 4, 3).eval()
        tokens = torch.tensor([[1, 5, 9, 63, 0, 0], [2, 3, 4, 5, 6, 63]])
        with torch.no_grad():
            refs = {k: v.numpy() for k, v in tm(tokens).items()}
        params = convert_openclip_text(_state_dict_for_converter(tm), layers=3)
        jm = OpenCLIPTextModel(vocab_size=64, max_len=16, width=32, heads=4,
                               layers=3)
        outs = jm.apply({"params": params}, jnp.asarray(tokens.numpy()))
        return refs, outs

    def test_all_hidden_states_match(self):
        refs, outs = self._build()
        for key in ("penultimate", "last", "last_norm", "pooled"):
            np.testing.assert_allclose(np.asarray(outs[key]), refs[key],
                                       atol=2e-4, rtol=1e-3, err_msg=key)


class _TorchOpenCLIPVision(torch.nn.Module):
    def __init__(self, image_size, patch, width, heads, layers, out_dim):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, width, patch, patch, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(width))
        n_tok = (image_size // patch) ** 2 + 1
        self.positional_embedding = torch.nn.Parameter(torch.randn(n_tok, width))
        self.ln_pre = torch.nn.LayerNorm(width)
        self.resblocks = torch.nn.ModuleList(
            [_TorchResblock(width, heads) for _ in range(layers)])
        self.ln_post = torch.nn.LayerNorm(width)
        self.proj = torch.nn.Parameter(torch.randn(width, out_dim))

    def forward(self, img):
        x = self.conv1(img).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for r in self.resblocks:
            x = r(x)
        x = self.ln_post(x)
        pooled, tokens = x[:, 0] @ self.proj, x[:, 1:]
        return pooled, tokens


class TestOpenCLIPVisionParity:
    def test_pooled_and_tokens_match(self):
        import jax.numpy as jnp

        from ccedit_tpu.modules.openclip import (
            OpenCLIPVisionModel,
            convert_openclip_vision,
        )

        torch.manual_seed(71)
        tm = _TorchOpenCLIPVision(16, 8, 32, 4, 2, 24).eval()
        img = torch.randn(2, 3, 16, 16)
        with torch.no_grad():
            pooled_ref, tokens_ref = (r.numpy() for r in tm(img))
        sd = _state_dict_for_converter(tm)
        params = convert_openclip_vision(sd, layers=2)
        jm = OpenCLIPVisionModel(image_size=16, patch_size=8, width=32, heads=4,
                                 layers=2, output_dim=24)
        pooled, tokens = jm.apply(
            {"params": params}, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
            output_tokens=True)
        np.testing.assert_allclose(np.asarray(pooled), pooled_ref, atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(tokens), tokens_ref, atol=2e-4,
                                   rtol=1e-3)


class TestEmbedderWrappers:
    """Wrapper-level smoke tests: prepare/init/embed contracts of the new
    conditioning embedders (tiny dims; parity is pinned separately)."""

    @pytest.mark.slow
    def test_clipt5_combo_returns_pair(self):
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.embedders import CLIPT5Embedder

        e = CLIPT5Embedder(t5_version="google/t5-v1_1-small")
        # shrink the towers for test speed
        from ccedit_tpu.modules.clip import CLIPTextModel
        from ccedit_tpu.modules.t5 import T5Encoder

        e.clip.model = CLIPTextModel(width=32, heads=4, layers=2)
        e.t5.model = T5Encoder(vocab_size=384, d_model=32, d_kv=8, d_ff=64,
                               heads=4, layers=2)
        e.t5.variant = "byt5"
        prep = e.prepare(["hi there"])
        params = e.init_params(jax.random.PRNGKey(0), prep)
        out = e.embed(params, prep)
        assert isinstance(out, list) and len(out) == 2
        assert out[0].shape[0] == 1 and out[1].shape[0] == 1

    def test_openclip_image_embedder_pipeline(self):
        import jax
        import numpy as np

        from ccedit_tpu.conditioning.embedders import OpenCLIPImageEmbedder
        from ccedit_tpu.modules.openclip import OpenCLIPVisionModel

        e = OpenCLIPImageEmbedder(repeat_to_max_len=True, max_length=7)
        e.model = OpenCLIPVisionModel(image_size=224, patch_size=56, width=32,
                                      heads=4, layers=1, output_dim=16)
        x = np.random.RandomState(0).rand(2, 64, 48, 3) * 2 - 1
        prep = e.prepare(x)
        assert prep.shape == (2, 224, 224, 3)
        params = e.init_params(jax.random.PRNGKey(0), prep)
        z_rep, z = e.embed(params, prep)
        assert z_rep.shape == (2, 7, 16) and z.shape == (2, 16)

    def test_t5_spm_requirement_message(self):
        from ccedit_tpu.conditioning.embedders import T5TextEmbedder

        e = T5TextEmbedder(version="google/t5-v1_1-small")
        with pytest.raises(AssertionError, match="spm_path"):
            e.prepare(["needs sentencepiece"])
