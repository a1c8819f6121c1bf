"""Cross-check the native C++ BPE tokenizer against the Python reference
implementation on a synthetic vocab (same fixture as TestTokenizer)."""

import json

import numpy as np
import pytest

from ccedit_tpu.conditioning import native_tokenizer
from ccedit_tpu.conditioning.tokenizer import ClipTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    base = list(bytes_to_unicode().values())
    vocab = {}
    for v in base:
        vocab[v] = len(vocab)
    for v in base:
        vocab[v + "</w>"] = len(vocab)
    for extra in ["he", "lo</w>", "llo</w>", "ing</w>", "th", "in", "the</w>",
                  "<|startoftext|>", "<|endoftext|>"]:
        vocab[extra] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version\nh e\nl o</w>\nl lo</w>\nt h\ni n\nth e</w>\n"
    )
    return d


@pytest.mark.skipif(not native_tokenizer.available(), reason="native lib not built")
class TestNativeTokenizer:
    def test_matches_python_reference(self, assets):
        py = ClipTokenizer(str(assets / "vocab.json"), str(assets / "merges.txt"))
        cc = native_tokenizer.NativeClipTokenizer(
            str(assets / "vocab.json"), str(assets / "merges.txt")
        )
        prompts = [
            "hello the world",
            "The    QUICK brown fox, it's 42!",
            "masterpiece, best quality, a robot bear walking",
            "",
            "punctuation... everywhere?! (yes)",
        ]
        np.testing.assert_array_equal(py(prompts), cc(prompts))

    def test_encode_ids_match(self, assets):
        py = ClipTokenizer(str(assets / "vocab.json"), str(assets / "merges.txt"))
        cc = native_tokenizer.NativeClipTokenizer(
            str(assets / "vocab.json"), str(assets / "merges.txt")
        )
        for text in ["hello", "the thing", "a1b2"]:
            assert py.encode(text) == cc.encode(text), text
