"""Training datasets.

Behavioural parity targets:
  * TextVideoDataset — sgm/data/webvid/base_video_dataset.py: resize +
    center-crop + normalize (:49-83), 'proportional' frame sampling with
    stride round(fps/prop_factor) and random start (:371-419), missing-file
    resample (:241-251), batch dict {jpg, txt, control_hint, cond_img,
    interpolate_first_last} (:281-328)
  * WebVid CSV metadata — sgm/data/webvid/webvid_dataset.py:8-66
  * toy datasets — synthetic moving-shapes clips replace the torchvision
    MNIST/CIFAR toys (no network in this environment)

TPU-first: plain-Python dataset objects + a double-buffered thread prefetcher
feeding numpy batches; device transfer happens in the train loop with the
mesh's batch sharding (no torch DataLoader).
"""

from __future__ import annotations

import csv
import os
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def resize_center_crop(frame: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Resize the short side then center-crop (base_video_dataset.py:49-83)."""
    h, w = frame.shape[:2]
    th, tw = hw
    scale = max(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = Image.fromarray(frame).resize((nw, nh), Image.BICUBIC)
    arr = np.asarray(img)
    y0 = (nh - th) // 2
    x0 = (nw - tw) // 2
    return arr[y0 : y0 + th, x0 : x0 + tw]


def proportional_frame_indices(
    n_frames: int,
    fps: float,
    num_frames: int,
    prop_factor: float = 6.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Stride round(fps/prop_factor) with random start; linspace fallback
    (base_video_dataset.py:371-419)."""
    stride = max(int(round(fps / prop_factor)), 1)
    span = stride * (num_frames - 1) + 1
    if span <= n_frames:
        start = int(rng.integers(0, n_frames - span + 1)) if rng is not None else 0
        return np.arange(start, start + span, stride)
    return np.linspace(0, n_frames - 1, num_frames).astype(int)


class TextVideoDataset:
    """Base dataset over (video_path, caption) items."""

    def __init__(
        self,
        items: Sequence[Tuple[str, str]],
        num_frames: int = 9,
        size_hw: Tuple[int, int] = (256, 384),
        prop_factor: float = 6.0,
        seed: int = 0,
        lax: bool = True,
    ):
        self.items = list(items)
        self.num_frames = num_frames
        self.size_hw = size_hw
        self.prop_factor = prop_factor
        self.rng = np.random.default_rng(seed)
        self.lax = lax

    def __len__(self):
        return len(self.items)

    def _load_frames(self, path: str) -> Tuple[List[np.ndarray], float]:
        from .video import _read_frames_cv2, _read_frames_dir, _read_frames_gif

        if os.path.isdir(path):
            return _read_frames_dir(path), 30.0
        if path.lower().endswith(".gif"):
            return _read_frames_gif(path), 30.0
        return _read_frames_cv2(path)

    def __getitem__(self, idx: int) -> Dict:
        for attempt in range(8):
            path, caption = self.items[idx]
            try:
                frames, fps = self._load_frames(path)
                if len(frames) == 0:
                    raise IOError("empty clip")
                break
            except Exception:
                if not self.lax and attempt == 7:
                    raise
                # missing/corrupt file -> resample another index
                # (base_video_dataset.py:241-251)
                idx = int(self.rng.integers(0, len(self.items)))
        sel = proportional_frame_indices(
            len(frames), fps, self.num_frames, self.prop_factor, self.rng
        )
        clip = np.stack([resize_center_crop(frames[i], self.size_hw) for i in sel])
        clip = clip.astype(np.float32) / 127.5 - 1.0  # (T,H,W,3)
        return {
            "jpg": clip,
            "txt": caption,
            "control_hint": clip.copy(),
            "cond_img": clip[self.num_frames // 2].copy(),
            "interpolate_first_last": np.stack([clip[0], clip[-1]]),
        }


class WebVidDataset(TextVideoDataset):
    """CSV-metadata dataset (results_{cut}_{split}.csv with videoid/name
    columns, webvid_dataset.py:8-66)."""

    def __init__(
        self,
        data_root: str,
        csv_path: str,
        video_subdir: str = "videos",
        caption_col: str = "name",
        id_col: str = "videoid",
        **kwargs,
    ):
        items = []
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                vid = row[id_col]
                items.append(
                    (os.path.join(data_root, video_subdir, f"{vid}.mp4"), row[caption_col])
                )
        super().__init__(items, **kwargs)


class SyntheticVideoDataset(TextVideoDataset):
    """Deterministic moving-square clips — the offline toy dataset (replaces
    the reference's torchvision MNIST/CIFAR toys for smoke training)."""

    def __init__(self, n_items: int = 64, num_frames: int = 8,
                 size_hw: Tuple[int, int] = (64, 64), seed: int = 0):
        super().__init__([("", f"moving square {i}") for i in range(n_items)],
                         num_frames=num_frames, size_hw=size_hw, seed=seed)

    def __getitem__(self, idx: int) -> Dict:
        h, w = self.size_hw
        t = self.num_frames
        rng = np.random.default_rng(idx)
        size = int(rng.integers(h // 8, h // 4))
        x0 = int(rng.integers(0, w - size - t * 2))
        y0 = int(rng.integers(0, h - size))
        color = rng.uniform(-1, 1, size=3).astype(np.float32)
        clip = -np.ones((t, h, w, 3), dtype=np.float32)
        for i in range(t):
            x = x0 + 2 * i
            clip[i, y0 : y0 + size, x : x + size] = color
        return {
            "jpg": clip,
            "txt": self.items[idx][1],
            "control_hint": clip.copy(),
            "cond_img": clip[t // 2].copy(),
            "interpolate_first_last": np.stack([clip[0], clip[-1]]),
        }


def collate(samples: List[Dict]) -> Dict:
    out: Dict = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        out[k] = vals if isinstance(vals[0], str) else np.stack(vals)
    return out


class DataLoader:
    """Shuffling batch iterator with a background prefetch thread (replaces
    torch DataLoader + worker seeding, detaset_webvid.py:49-64)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shuffle: bool = True, prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            idx = self._epoch_indices()
            n_full = len(idx) // self.batch_size
            end = n_full * self.batch_size if self.drop_last else len(idx)
            for s in range(0, end, self.batch_size):
                chunk = idx[s : s + self.batch_size]
                q.put(collate([self.dataset[int(i)] for i in chunk]))
            q.put(stop)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
