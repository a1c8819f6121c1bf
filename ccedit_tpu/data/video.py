"""Host-side video/image IO for inference.

Behavioural parity target: scripts/sampling/util.py:288-352 (save) and
:631-762 (load_video_keyframes):
  * mp4 via decord / gif via imageio / frame-directory via PIL — here decord
    is replaced by cv2.VideoCapture (no ffmpeg binary in this image);
  * fps resampling: gap = round(origin_fps / target_fps), random=False start,
    linspace fallback when the clip is too short (util.py:705-746);
  * bicubic resize to (H, W), scaled to [-1, 1].

Arrays are returned channels-last (T, H, W, 3) float32 — the framework's
native layout.  (A C++ decode path is a planned optimization; this host
pipeline overlaps with TPU compute via async dispatch.)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def _resize_bicubic(frame: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    img = Image.fromarray(frame)
    img = img.resize((hw[1], hw[0]), Image.BICUBIC)
    return np.asarray(img)


def _read_frames_cv2(path: str) -> Tuple[List[np.ndarray], float]:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames, fps


def _read_frames_gif(path: str) -> List[np.ndarray]:
    import imageio.v3 as iio

    arr = iio.imread(path, index=None)
    return [np.asarray(f)[..., :3] for f in arr]


def _read_frames_dir(path: str) -> List[np.ndarray]:
    files = sorted(
        f for f in Path(path).iterdir()
        if f.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    )
    if not files:
        raise IOError(f"no frames in {path}")
    return [np.asarray(Image.open(f).convert("RGB")) for f in files]


def select_keyframe_indices(
    n_frames: int,
    origin_fps: float,
    target_fps: float,
    num_keyframes: int,
    start: int = 0,
) -> np.ndarray:
    """util.py:705-746: stride round(origin/target); if the strided window
    overruns the clip, fall back to linspace over the whole clip."""
    gap = max(int(round(origin_fps / target_fps)), 1)
    last = start + gap * (num_keyframes - 1)
    if last < n_frames:
        return np.arange(start, last + 1, gap)
    return np.linspace(0, n_frames - 1, num_keyframes).astype(int)


def load_video_keyframes(
    path: str,
    origin_fps: Optional[float] = None,
    target_fps: float = 6.0,
    num_keyframes: int = 17,
    size_hw: Tuple[int, int] = (512, 768),
    out_dtype: str = "float32",
) -> np.ndarray:
    """Returns (T, H, W, 3).  out_dtype:
      'float32' — [-1, 1] (the framework's math layout);
      'uint8'   — raw RGB bytes, NO host float conversion.  Decoders emit
        uint8 natively, so this path skips two full passes over the clip
        (float expand + re-quantize) and uploads 4x fewer bytes; the model
        dequantizes on device (measured: the float round-trip alone cost
        ~1.3 s/clip on the bench host, PERF_r3 depth-stage probe).
    """
    from . import native_decode

    want_u8 = out_dtype == "uint8"
    p = str(path)
    if p.lower().endswith(VIDEO_EXTS) and native_decode.available():
        # native path: probe frame count + fps cheaply, then decode + resize
        # the selected keyframes in C++ (decord-equivalent; native_decode.py)
        import cv2

        cap = cv2.VideoCapture(p)
        if not cap.isOpened():
            raise IOError(f"cannot open video {p}")
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = origin_fps or (cap.get(cv2.CAP_PROP_FPS) or 30.0)
        cap.release()
        if n > 0:
            idx = select_keyframe_indices(n, fps, target_fps, num_keyframes)
            try:
                if want_u8:
                    return native_decode.decode_clip_u8(
                        p, idx, size_hw[0], size_hw[1])
                return native_decode.decode_clip(p, idx, size_hw[0], size_hw[1])
            except (IOError, AssertionError):
                pass  # container lied about frame count / stale lib; fallback

    if os.path.isdir(p):
        frames = _read_frames_dir(p)
        fps = origin_fps or 30.0
    elif p.lower().endswith(".gif"):
        frames = _read_frames_gif(p)
        fps = origin_fps or 30.0
    elif p.lower().endswith(VIDEO_EXTS):
        frames, file_fps = _read_frames_cv2(p)
        fps = origin_fps or file_fps
    else:
        raise ValueError(f"unsupported video source {p!r}")

    idx = select_keyframe_indices(len(frames), fps, target_fps, num_keyframes)
    out = np.stack([_resize_bicubic(frames[i], size_hw) for i in idx])
    if want_u8:
        return np.ascontiguousarray(out)  # decoders produce uint8 already
    return out.astype(np.float32) / 127.5 - 1.0


def load_image(path: str, size_hw: Tuple[int, int]) -> np.ndarray:
    """Reference frame loader (sampling_tv2v_ref.py load_img): (H,W,3) in [-1,1]."""
    img = Image.open(path).convert("RGB")
    img = img.resize((size_hw[1], size_hw[0]), Image.BICUBIC)
    return np.asarray(img).astype(np.float32) / 127.5 - 1.0


def to_uint8(frames: np.ndarray) -> np.ndarray:
    if frames.dtype == np.uint8:
        # already quantized (e.g. on-device: casting before the device->host
        # fetch moves 4x fewer bytes than fp32 — the fetch dominates encode
        # time on RPC-tunneled hosts)
        return frames
    return np.clip((frames + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_video_frames(
    frames: np.ndarray,
    out_path: str,
    fps: float = 6.0,
    save_grid: bool = False,
) -> None:
    """frames: (T,H,W,3) in [-1,1].  .gif via imageio; .mp4 via cv2 VideoWriter;
    frame-dir if out_path has no extension (perform_save_locally_video,
    scripts/sampling/util.py:288-352)."""
    frames8 = to_uint8(np.asarray(frames))
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    suffix = out.suffix.lower()
    if suffix == ".gif":
        import imageio

        imageio.mimsave(str(out), list(frames8), duration=1000.0 / fps, loop=0)
    elif suffix in (".mp4", ".avi"):
        import cv2

        h, w = frames8.shape[1:3]
        fourcc = cv2.VideoWriter_fourcc(*("mp4v" if suffix == ".mp4" else "XVID"))
        vw = cv2.VideoWriter(str(out), fourcc, fps, (w, h))
        for f in frames8:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    else:
        out.mkdir(parents=True, exist_ok=True)
        for i, f in enumerate(frames8):
            Image.fromarray(f).save(out / f"frame_{i:05d}.png")
    if save_grid:
        t, h, w, _ = frames8.shape
        grid = frames8.transpose(1, 0, 2, 3).reshape(h, t * w, 3)
        Image.fromarray(grid).save(out.with_suffix(".grid.png"))


def save_panel_grid(rows, out_path: str, max_frames: int = 8) -> None:
    """Conditioning-panel grid: each row is a (T,H,W,3) clip in [-1,1]; rows
    are stacked vertically, frames horizontally (the reference ImageLogger's
    log_images grid, main.py:439-487)."""
    import numpy as np

    t = min(min(r.shape[0] for r in rows), max_frames)
    h = min(r.shape[1] for r in rows)
    w = min(r.shape[2] for r in rows)
    grid_rows = []
    for r in rows:
        frames = [np.asarray(r[i][:h, :w]) for i in range(t)]
        grid_rows.append(np.concatenate(frames, axis=1))
    grid = to_uint8(np.concatenate(grid_rows, axis=0))
    try:
        import cv2

        cv2.imwrite(out_path, grid[:, :, ::-1])
    except Exception:
        from PIL import Image

        Image.fromarray(grid).save(out_path)
