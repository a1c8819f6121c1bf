"""Shape-bucketing compile policy (SURVEY.md §7.3 hard-part #5).

Under XLA every distinct (H, W, T, steps) request geometry is its own
compiled program: at SD scale a fresh geometry pays a 250-900 s remote
compile (docs/PERF_r4.md §5) and the persistent compile cache only helps
exact repeats.  The PyTorch reference pays zero marginal cost for new
geometry because it runs eagerly — but it ALSO resizes every input clip to
the requested (H, W) before editing (scripts/sampling/util.py:705-746), so
snapping requests onto a supported grid is the *same user contract*,
implemented TPU-first: any request inside the production envelope lands in
one of a small set of buckets and reuses that bucket's cached program.

Policy (see docs/PERF_r5.md for the measured effect):

* **H, W** — rounded UP to the next multiple of 64 inside the production
  envelope [256, 1024]; requests within one grid step BELOW the envelope are
  pulled up into it (they are not 64-aligned, so exact execution crashes the
  UNet's skip alignment in both frameworks — see snap_dim).  64 px = 8 latent rows = one full 8-sublane VPU
  tile at f=8, the granularity every tested geometry already uses.  The
  input clip is decoded straight to the bucket size (replacing, not adding,
  a resize) and outputs are bicubic-resized back to the requested (H, W)
  on host at save time.
* **T (num_keyframes)** — rounded UP into ``T_GRID``.  The clip keeps its
  T requested keyframes and is edge-padded (first/last frame replicated)
  up to the bucket length; padded frames are cropped from the output.  The
  pad is split so the bucket's center frame IS the request's center frame,
  because the TVI2V appearance branch injects onto frame T//2
  (reference controlmodel.py:529-531) and the CFCA anchor is the center
  frame (attention.py:1322-1336).
* **steps** — snapped to the NEAREST entry of ``STEPS_GRID`` (ties round
  up).  Step count is a quality/latency knob, not content; the grid covers
  both reference workloads (30-step TV2V, 50-step TVI2V, README.md:56-77).

Requests *outside* the envelope (debug geometries below it, exotic ones
above it) pass through exactly and simply compile fresh — the policy never
rejects a request the reference would accept.  ``--exact_shapes`` disables
bucketing entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# Production envelope.  Inside it, requests snap to the grid; outside it,
# they pass through exact (+ one printed note).
HW_MIN = 256
HW_MAX = 1024
HW_STEP = 64
# The latent spatial-token count (H/8 x W/8) must stay a multiple of 128:
# the Pallas flash-attention gate (ops/attention.py _flash_ok) requires
# 128-aligned sequence lengths, and at SD scale the XLA fallback would
# materialize the full score tensor (measured: 448x704 -> 4928 tokens,
# 26.8 GB allocation, HBM OOM).  64-multiples give tokens = (H/64)(W/64)*64,
# so the rule is "(H/64)*(W/64) even"; when a snapped (H, W) violates it the
# larger side is bumped one step (smallest relative resize).
TOKEN_MULTIPLE = 128
LATENT_F = 8
# T grid: every clip length the repo's tested programs use (8/9/17 are the
# BASELINE + dryrun geometries, 12 the reference training recipe, 25/33
# headroom for longer edits at the same fps contract).
T_GRID = (8, 9, 12, 17, 25, 33)
# steps grid: the reference's own workloads are 10 (debug), 30 (TV2V
# headline), 50 (TVI2V); 20 fills the quality gap between debug and
# production so nothing snaps across a 3x latency cliff.
STEPS_GRID = (10, 20, 30, 50)


def snap_dim(d: int) -> int:
    """Next multiple of HW_STEP at or above ``d`` for any ``d`` inside the
    envelope or within one grid step below it; anything further below (debug
    geometries) or above (exotic) passes through unchanged.

    The below-envelope pull-up matters: a request like 250 px is not
    64-aligned, so running it exactly crashes the UNet's down/up skip
    alignment (latents 31 -> 16 -> 32 != 31) — in this framework AND in the
    reference's torch UNet, which has the same stride-2 structure.  Snapping
    it up to HW_MIN both runs and reuses a cached bucket (observed live:
    a 250x250 user request, round-5 verify)."""
    if d <= HW_MIN - HW_STEP or d > HW_MAX:
        return d
    return int(-(-d // HW_STEP) * HW_STEP)


def snap_t(t: int) -> int:
    """Smallest grid clip length >= t; out-of-envelope passes through."""
    if t < T_GRID[0] or t > T_GRID[-1]:
        return t
    return next(g for g in T_GRID if g >= t)


def snap_steps(s: int) -> int:
    """Nearest grid step count (ties round up); out-of-envelope passes
    through."""
    if s < STEPS_GRID[0] or s > STEPS_GRID[-1]:
        return s
    return min(STEPS_GRID, key=lambda g: (abs(g - s), -g))


def pad_split(t_req: int, t_bucket: int) -> Tuple[int, int]:
    """(pad_left, pad_right) such that the padded clip's center frame
    (index t_bucket//2) is the request's center frame (index t_req//2)."""
    pad_l = t_bucket // 2 - t_req // 2
    pad_r = t_bucket - t_req - pad_l
    assert pad_l >= 0 and pad_r >= 0, (t_req, t_bucket)
    return pad_l, pad_r


@dataclasses.dataclass(frozen=True)
class BucketPlan:
    """A resolved request->bucket mapping plus the host-side restore ops."""

    req_h: int
    req_w: int
    req_t: int
    req_steps: int
    h: int
    w: int
    t: int
    steps: int

    @property
    def changed(self) -> bool:
        return (self.req_h, self.req_w, self.req_t, self.req_steps) != (
            self.h, self.w, self.t, self.steps)

    @property
    def in_envelope(self) -> bool:
        """Whether the planned geometry is a reusable grid bucket on EVERY
        axis.  False means an exact pass-through program (out-of-envelope
        H/W, misaligned H/W under --exact_shapes, or out-of-grid T/steps):
        it compiles fresh and no bucketed request will ever reuse it —
        deploy tooling reports the distinction so such a compile is never
        mistaken for a warmed shared bucket."""
        return (
            HW_MIN <= self.h <= HW_MAX and HW_MIN <= self.w <= HW_MAX
            and self.h % HW_STEP == 0 and self.w % HW_STEP == 0
            and _tokens_aligned(self.h, self.w)
            and self.t in T_GRID and self.steps in STEPS_GRID
        )

    @property
    def t_pad(self) -> Tuple[int, int]:
        return pad_split(self.req_t, self.t)

    def pad_frames(self, frames: np.ndarray) -> np.ndarray:
        """Edge-pad a (T, H, W, C) clip along T up to the bucket length."""
        assert frames.shape[0] == self.req_t, (frames.shape, self.req_t)
        pad_l, pad_r = self.t_pad
        if pad_l == 0 and pad_r == 0:
            return frames
        return np.concatenate(
            [np.repeat(frames[:1], pad_l, axis=0), frames,
             np.repeat(frames[-1:], pad_r, axis=0)], axis=0)

    def restore_clip(self, clip: np.ndarray) -> np.ndarray:
        """Crop the T padding and resize back to the requested (H, W).
        clip: (T_bucket, H_bucket, W_bucket, 3) uint8 -> requested geometry."""
        pad_l, _ = self.t_pad
        clip = clip[pad_l:pad_l + self.req_t]
        if (self.req_h, self.req_w) != (self.h, self.w):
            from PIL import Image

            clip = np.stack([
                np.asarray(Image.fromarray(f).resize(
                    (self.req_w, self.req_h), Image.BICUBIC))
                for f in clip])
        return clip

    def describe(self) -> str:
        return (f"(H,W,T,steps) ({self.req_h},{self.req_w},{self.req_t},"
                f"{self.req_steps}) -> bucket ({self.h},{self.w},{self.t},"
                f"{self.steps})")


def _tokens_aligned(h: int, w: int) -> bool:
    return ((h // LATENT_F) * (w // LATENT_F)) % TOKEN_MULTIPLE == 0


def snap_hw(h: int, w: int) -> Tuple[int, int]:
    """Joint (H, W) snap: per-dim grid snap, then bump the larger side by
    one grid step if the latent token count is not TOKEN_MULTIPLE-aligned
    (required by the flash-attention gate at SD scale — see header)."""
    h2, w2 = snap_dim(h), snap_dim(w)
    in_env = (HW_MIN <= h2 <= HW_MAX) and (HW_MIN <= w2 <= HW_MAX)
    if not in_env or _tokens_aligned(h2, w2):
        return h2, w2
    # bump the larger side first (smallest relative resize), then the
    # other side, then both
    larger = (h2, w2 + HW_STEP) if w2 >= h2 else (h2 + HW_STEP, w2)
    other = (h2 + HW_STEP, w2) if w2 >= h2 else (h2, w2 + HW_STEP)
    for ch, cw in (larger, other, (h2 + HW_STEP, w2 + HW_STEP)):
        if ch <= HW_MAX and cw <= HW_MAX and _tokens_aligned(ch, cw):
            return ch, cw
    return h2, w2  # nothing aligned inside the envelope: keep the snap


def plan_geometry(h: int, w: int, t: int, steps: int,
                  enabled: bool = True) -> BucketPlan:
    """Map a requested geometry onto the supported bucket grid.

    An out-of-envelope (H, W) passes the WHOLE request through exact —
    the header's "outside the envelope" contract.  Such a geometry is an
    exotic/debug request whose program is effectively unique, so snapping
    T or steps would change the user's quality/latency knobs for no real
    reuse; and the reference's torch UNet fails the same misaligned
    geometries we would, so exact pass-through never rejects a request
    the reference accepts.  Inside the envelope each axis snaps on its
    own grid (out-of-grid T or steps still passes that axis through —
    see snap_t / snap_steps)."""
    if not enabled:
        return BucketPlan(h, w, t, steps, h, w, t, steps)
    bh, bw = snap_hw(h, w)
    hw_in_env = (HW_MIN <= bh <= HW_MAX) and (HW_MIN <= bw <= HW_MAX)
    if not hw_in_env:
        return BucketPlan(h, w, t, steps, h, w, t, steps)
    return BucketPlan(h, w, t, steps, bh, bw, snap_t(t), snap_steps(steps))
