"""ctypes binding for the native C++ CLIP BPE tokenizer.

The native path (native/tokenizer/clip_bpe.cpp) replaces the role HF's Rust
`tokenizers` plays for the reference; the pure-Python ClipTokenizer remains
the behavioral reference (cross-checked in tests/test_native_tokenizer.py).
Falls back transparently when the shared library isn't built.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from .tokenizer import MAX_LEN

_LIB_PATH = (
    Path(__file__).resolve().parents[2] / "native" / "lib" / "libclip_bpe.so"
)


def _load_lib() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.clip_tokenizer_create.restype = ctypes.c_void_p
    lib.clip_tokenizer_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.clip_tokenizer_destroy.argtypes = [ctypes.c_void_p]
    lib.clip_tokenizer_encode.restype = ctypes.c_int32
    lib.clip_tokenizer_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


class NativeClipTokenizer:
    """Drop-in for ClipTokenizer backed by the C++ implementation."""

    def __init__(self, vocab_path: str, merges_path: str):
        self._lib = _load_lib()
        if self._lib is None:
            raise FileNotFoundError(
                f"native tokenizer not built ({_LIB_PATH}); run native/build.sh"
            )
        self._handle = self._lib.clip_tokenizer_create(
            str(vocab_path).encode(), str(merges_path).encode()
        )
        if not self._handle:
            raise IOError(f"failed to load tokenizer assets {vocab_path}, {merges_path}")

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.clip_tokenizer_destroy(self._handle)

    def encode(self, text: str, max_len: int = MAX_LEN):
        buf = (ctypes.c_int32 * max_len)()
        n = self._lib.clip_tokenizer_encode(
            self._handle, text.encode("utf-8"), max_len, buf
        )
        # strip BOS/EOS to mirror ClipTokenizer.encode()
        return list(buf[1 : n - 1])

    def __call__(self, texts: Sequence[str], max_len: int = MAX_LEN) -> np.ndarray:
        out = np.empty((len(texts), max_len), dtype=np.int32)
        buf = (ctypes.c_int32 * max_len)()
        for i, text in enumerate(texts):
            self._lib.clip_tokenizer_encode(
                self._handle, text.encode("utf-8"), max_len, buf
            )
            out[i] = np.frombuffer(buf, dtype=np.int32)
        return out


def available() -> bool:
    return _LIB_PATH.exists()
