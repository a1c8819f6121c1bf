"""ctypes bindings for the native threaded decode pipeline.

Replaces the reference's decord dependency (sgm/data/base_video_dataset.py:
486-505): clip decode + bicubic resize + [-1,1] float conversion run in C++
worker threads (native/decode/video_decode.cpp) writing straight into
numpy-owned buffers — the training loader and the CLI keyframe loader never
hold the GIL for IO.  Falls back transparently when the library isn't built
(``available()``); keyframe SELECTION stays in python so the exact reference
fps-resampling semantics live in one place (data/video.py).
"""

from __future__ import annotations

import ctypes
import itertools
import threading
from pathlib import Path
from typing import Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = Path(__file__).resolve().parents[2]
    for cand in (root / "native" / "decode" / "libvideo_decode.so",):
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
            except OSError:
                continue
            lib.vd_decode_clip.restype = ctypes.c_int
            if hasattr(lib, "vd_decode_clip_u8"):
                lib.vd_decode_clip_u8.restype = ctypes.c_int
            lib.vd_decode_images.restype = ctypes.c_int
            lib.vd_pool_create.restype = ctypes.c_void_p
            lib.vd_pool_submit_clip.restype = ctypes.c_int
            lib.vd_pool_submit_images.restype = ctypes.c_int
            lib.vd_pool_wait.restype = ctypes.c_int
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_clip(path: str, indices: Sequence[int], h: int, w: int) -> np.ndarray:
    """Decode the given frame indices of a video file -> (T,H,W,3) [-1,1]."""
    lib = _load()
    assert lib is not None, "native decode library not built"
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    out = np.empty((len(idx), h, w, 3), np.float32)
    rc = lib.vd_decode_clip(
        path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(idx), h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_clip_u8(path: str, indices: Sequence[int], h: int, w: int) -> np.ndarray:
    """Decode frame indices -> (T,H,W,3) uint8 RGB (no float conversion —
    the cheap form to upload over a slow host<->device link)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "vd_decode_clip_u8"), \
        "native decode library not built (or stale: rerun native/build.sh)"
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    out = np.empty((len(idx), h, w, 3), np.uint8)
    rc = lib.vd_decode_clip_u8(
        path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(idx), h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def decode_images(paths: Sequence[str], h: int, w: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native decode library not built"
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    out = np.empty((len(paths), h, w, 3), np.float32)
    rc = lib.vd_decode_images(
        arr, len(paths), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native image decode failed ({rc})")
    return out


class DecodePool:
    """Threaded prefetch pool: submit clips/frame-lists, wait per job.
    Buffers are owned by numpy; the C++ workers fill them in place."""

    def __init__(self, n_threads: int = 4):
        lib = _load()
        assert lib is not None, "native decode library not built"
        self._lib = lib
        self._pool = lib.vd_pool_create(n_threads)
        self._ids = itertools.count(1)
        self._bufs = {}
        self._lock = threading.Lock()

    def submit_clip(self, path: str, indices: Sequence[int], h: int,
                    w: int) -> int:
        idx = np.ascontiguousarray(indices, dtype=np.int32)
        out = np.empty((len(idx), h, w, 3), np.float32)
        with self._lock:
            job = next(self._ids)
            self._bufs[job] = (out, idx)  # keep idx alive until submit copies
        self._lib.vd_pool_submit_clip(
            ctypes.c_void_p(self._pool), ctypes.c_uint64(job), path.encode(),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(idx), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return job

    def submit_images(self, paths: Sequence[str], h: int, w: int) -> int:
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        out = np.empty((len(paths), h, w, 3), np.float32)
        with self._lock:
            job = next(self._ids)
            self._bufs[job] = (out, arr)
        self._lib.vd_pool_submit_images(
            ctypes.c_void_p(self._pool), ctypes.c_uint64(job), arr,
            len(paths), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return job

    def wait(self, job: int) -> np.ndarray:
        rc = self._lib.vd_pool_wait(ctypes.c_void_p(self._pool),
                                    ctypes.c_uint64(job))
        with self._lock:
            out, _keepalive = self._bufs.pop(job)
        if rc != 0:
            raise IOError(f"native decode job {job} failed ({rc})")
        return out

    def close(self):
        if self._pool:
            self._lib.vd_pool_destroy(ctypes.c_void_p(self._pool))
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
