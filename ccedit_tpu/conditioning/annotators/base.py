"""Structure-hint annotators (depth / lineart / edge / normal / pose).

Reference behavior (sgm/modules/encoders/modules.py):
  * DepthMidasEncoder (:1346-1392): MiDaS dpt_hybrid depth per frame, global
    min-max normalize, clamp, ->[-1,1], NEGATE, repeat to 3 channels.
  * DepthZoeEncoder (:1289-1342): ZoeDepth metric depth, per-sample 2%/85%
    kth-value normalization, ->[-1,1], repeat to 3 channels (no negation).
  * LineartEncoder 'standard' mode (:1213-1274): weight-free cv2 pipeline
    (implemented exactly in lineart.py).

Design: an annotator = backbone (a flax depth/edge model with converted
weights) + the exact reference post-processing.  When no backbone weights are
available the ``gradient`` stub produces a deterministic luminance/gradient
pseudo-hint so pipelines run end-to-end — clearly NOT MiDaS; swap in real
weights via ``backbone_params`` for production.

Input/output layout: (B, T, H, W, 3) in [-1, 1] (video, channels-last).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.misc import as_float_frames
from ..embedders import Embedder


def _eager_context() -> bool:
    """True only outside any JAX trace.  The chunk-pipelined host path calls
    an inner jax.jit and memoizes its output; doing that while an OUTER
    transform is tracing (e.g. engine.init_params jits Conditioner.embed
    over a host numpy clip) would memoize a tracer that leaks into later
    eager calls (UnexpectedTracerError)."""
    try:
        from jax._src.core import trace_state_clean  # not re-exported >=0.4.34
        return trace_state_clean()
    except ImportError:  # renamed across JAX versions; be conservative
        return False


def _luma(x):
    # x in [-1,1], (N,H,W,3) -> (N,H,W,1) luminance in [0,1]
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=x.dtype)
    return ((x + 1.0) * 0.5 * w).sum(-1, keepdims=True)


def gradient_pseudo_depth(x):
    """Deterministic stand-in backbone: smoothed inverse luminance.  Serves
    as a placeholder 'relative depth' until real MiDaS/Zoe weights are
    converted; same ranges/shape contract as the real backbones."""
    y = _luma(x)
    k = jnp.ones((5, 5, 1, 1), dtype=x.dtype) / 25.0
    y = jax.lax.conv_general_dilated(
        y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return 1.0 - y[..., 0]  # (N,H,W) higher = closer


def midas_postprocess(depth):
    """min-max -> clamp -> [-1,1] -> negate -> 3ch (modules.py:1367-1383)."""
    depth = depth - jnp.min(depth)
    depth = depth / jnp.maximum(jnp.max(depth), 1e-8)
    depth = jnp.clip(depth, 0.0, 1.0) * 2.0 - 1.0
    depth = -depth
    return jnp.repeat(depth[..., None], 3, axis=-1)


def zoe_postprocess(depth_bt, batch: int):
    """Per-sample 2%/85% kth-value normalization (modules.py:1316-1331).
    depth_bt: (B*T, H, W)."""
    bt, h, w = depth_bt.shape
    t = bt // batch
    d = depth_bt.reshape(batch, t, h, w)
    flat = d.reshape(batch, -1)
    n = flat.shape[1]
    k_lo = max(int(0.02 * n), 1)
    k_hi = max(int(0.85 * n), 1)
    svals = jnp.sort(flat, axis=1)
    vmin = svals[:, k_lo - 1]
    vmax = svals[:, k_hi - 1]
    d = (d - vmin[:, None, None, None]) / (vmax - vmin)[:, None, None, None]
    d = jnp.clip(d, 0.0, 1.0) * 2.0 - 1.0
    d = d.reshape(bt, h, w)
    return jnp.repeat(d[..., None], 3, axis=-1)


class AnnotatorEmbedder(Embedder):
    """Generic annotator: fold video -> per-frame backbone -> postprocess."""

    def __init__(
        self,
        kind: str,
        backbone: Optional[Callable] = None,
        backbone_params: Any = None,
        allow_fake: bool = False,
        safe: bool = False,
    ):
        self.kind = kind
        self.backbone = backbone
        self.backbone_params = backbone_params
        self.allow_fake = allow_fake
        self.safe = safe  # safe_step quantization (modules.py:1433-1434)
        self._chunked = None  # lazy ChunkedAnnotator (eager-inference path)
        # small hint cache for the eager path: key -> (input ref, output).
        # Holding the input ref keeps its id() from being recycled.  A few
        # entries (not one) so BalanceCC-style job lists that interleave
        # videos still hit across jobs.
        self._chunk_memo: "OrderedDict" = OrderedDict()
        self._chunk_memo_cap = 4

    def init_params(self, rng, prepared):
        return None  # frozen; real backbone params are loaded, not initialized

    def embed(self, params, prepared):
        if (
            isinstance(prepared, np.ndarray)
            and self.kind == "depth_midas"
            and self.backbone is not None
            and _eager_context()
        ):
            # eager inference with a host-resident clip: chunk-pipeline the
            # upload behind the DPT compute (PERF_r3 §16 — the whole depth
            # stage drops from 2.1-4.5 s to ~0.6 s on an RPC-tunneled host);
            # exact same math, just overlapped transfers
            return self._embed_host_chunked(prepared)
        x = as_float_frames(prepared)  # (B,T,H,W,3) in [-1,1] (uint8 ok)
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])

        if self.kind == "depth_midas":
            depth = self._run_backbone(frames)
            out = midas_postprocess(depth)
        elif self.kind == "depth_zoe":
            depth = self._run_backbone((frames + 1.0) * 0.5)
            out = zoe_postprocess(depth, b)
        elif self.kind == "lineart_standard":
            from .lineart import lineart_standard_jnp

            out = lineart_standard_jnp(frames)
        elif self.kind == "lineart_model":
            from .lineart_model import LineartGenerator, detect_lineart

            assert self.backbone_params is not None, (
                "lineart_model needs converted sk_model.pth weights "
                "(io.torch_convert.load_torch_state_dict + convert_lineart)"
            )
            line = detect_lineart(
                self.backbone_params, frames, LineartGenerator(n_residual_blocks=3)
            )
            # LineartEncoder negates and repeats to 3ch (modules.py:1252,1270)
            out = jnp.repeat(-line, 3, axis=-1)
        elif self.kind in ("scribble_hed", "softedge_hed"):
            from .hed import HEDNetwork, detect_hed

            assert self.backbone_params is not None, (
                "HED needs converted ControlNetHED_Apache2 weights"
            )
            edge = detect_hed(self.backbone_params, frames, HEDNetwork())
            if self.kind == "scribble_hed":
                # complete the reference's abandoned ScribbleHEDEncoder
                # (modules.py:1604-1608 raises mid-forward): scribble NMS on
                # the fused HED edge, then the standard 1-x -> [-1,1] mapping
                from .scribble import scribble_postprocess

                scrib = scribble_postprocess(jax.device_get(edge[..., 0]))
                edge = jnp.asarray(scrib)[..., None]
            out = jnp.repeat((1.0 - edge) * 2.0 - 1.0, 3, axis=-1)
        elif self.kind in ("softedge_pidinet", "scribble_pidinet"):
            from .pidinet import PiDiNet, detect_pidinet, safe_step

            assert self.backbone_params is not None, (
                "PiDiNet needs converted table5_pidinet weights"
            )
            # modules.py:1427-1437: input 0..1, RGB->BGR flip, fused sigmoid
            bgr01 = ((frames + 1.0) * 0.5)[..., ::-1]
            edge = detect_pidinet(self.backbone_params, bgr01, PiDiNet())
            if self.kind == "scribble_pidinet":
                # modules.py:1678-1690: nms + blur + binarize on host
                from .scribble import scribble_postprocess

                scrib = scribble_postprocess(jax.device_get(edge[..., 0]))
                edge = jnp.asarray(scrib)[..., None]
            else:
                # reference order (annotator/pidinet & modules.py:1427-1437):
                # safe_step FIRST (its output may exceed 1), clamp after
                if self.safe:
                    edge = safe_step(edge)
                edge = jnp.clip(edge, 0.0, 1.0)
            out = jnp.repeat((1.0 - edge) * 2.0 - 1.0, 3, axis=-1)
        elif self.kind == "normal_bae":
            from .normalbae import NNET, detect_normalbae

            assert self.backbone_params is not None, (
                "normal_bae needs converted scannet.pt NNET weights"
            )
            # modules.py:1497-1524: input 0..1 ImageNet-normalized; output
            # negated + clamped normals (3ch)
            out = detect_normalbae(self.backbone_params,
                                   (frames + 1.0) * 0.5, NNET())
        elif self.kind == "openpose":
            from .openpose import BodyEstimator, detect_openpose

            assert self.backbone_params is not None, (
                "openpose needs converted body_pose_model.pth weights"
            )
            est = self._openpose_est = getattr(
                self, "_openpose_est", None
            ) or BodyEstimator(self.backbone_params)
            out = jnp.asarray(detect_openpose(None, np.asarray(frames), est))
        else:
            raise NotImplementedError(
                f"annotator {self.kind!r}: backbone not yet implemented on TPU; "
                "precompute hints host-side and use an IdentityEncoder, or "
                "provide converted weights"
            )
        return out.reshape((b, t) + out.shape[1:])

    def _embed_host_chunked(self, video_np: np.ndarray):
        """Depth hint via the chunk-pipelined driver (chunked.py): per-chunk
        device_put + backbone dispatch, ONE clip-global MiDaS postprocess.
        Memoized on the exact input array: the sampling CLI passes the same
        clip in batch and batch_uc (and, with the pipeline's decoded-clip
        cache, across jobs on the same video), so repeat passes reuse the
        hint instead of re-running DPT."""
        key = (id(video_np), video_np.shape, str(video_np.dtype))
        hit = self._chunk_memo.get(key)
        if hit is not None:
            self._chunk_memo.move_to_end(key)
            return hit[1]
        from .chunked import ChunkedAnnotator

        if self._chunked is None:
            def bk(p, fr):
                return self.backbone(p, as_float_frames(fr))

            self._chunked = ChunkedAnnotator(
                bk, postprocess=midas_postprocess, chunk=5)
        b, t = video_np.shape[0], video_np.shape[1]
        frames = video_np.reshape((b * t,) + video_np.shape[2:])
        out = self._chunked(self.backbone_params, frames)
        out = out.reshape((b, t) + out.shape[1:])
        # keep a ref to the input so the id() key can't be recycled, and
        # freeze it: the memo is identity-keyed, so in-place mutation of a
        # cached clip would otherwise silently serve stale depth
        video_np.setflags(write=False)
        self._chunk_memo[key] = (video_np, out)
        while len(self._chunk_memo) > self._chunk_memo_cap:
            self._chunk_memo.popitem(last=False)
        return out

    def _run_backbone(self, frames):
        if self.backbone is None:
            if not self.allow_fake:
                raise RuntimeError(
                    f"annotator {self.kind!r} has no backbone weights loaded. "
                    "Pass ckpt_path in the embedder YAML (e.g. "
                    "dpt_hybrid-midas-501f0c75.pt) or opt into the luminance "
                    "pseudo-depth stand-in with --fake_annotator / "
                    "params={'fake_annotator': True} (NOT MiDaS; debug only)."
                )
            return gradient_pseudo_depth(frames)
        return self.backbone(self.backbone_params, frames)


_KIND_MAP = {
    "DepthMidasEncoder": "depth_midas",
    "DepthZoeEncoder": "depth_zoe",
    "LineartEncoder": "lineart_standard",
    "SoftEdgeEncoder": "softedge_pidinet",
    "NormalBaeEncoder": "normal_bae",
    "ScribbleHEDEncoder": "scribble_hed",
    "ScribblePidiNetEncoder": "scribble_pidinet",
    "OpenposeEncoder": "openpose",
}


def build_annotator(target_name: str, params: Dict) -> AnnotatorEmbedder:
    kind = _KIND_MAP[target_name]
    if target_name == "LineartEncoder" and not params.get("lineart_standard", True):
        kind = "lineart_model"
    backbone = None
    backbone_params = None
    ckpt = params.get("ckpt_path")
    if ckpt:
        from ...io.torch_convert import load_torch_state_dict

        sd = load_torch_state_dict(ckpt)
        if kind == "lineart_model":
            from .lineart_model import convert_lineart

            backbone_params = convert_lineart(sd)
        elif kind in ("scribble_hed", "softedge_hed"):
            from .hed import convert_hed

            backbone_params = convert_hed(sd)
        elif kind == "depth_midas":
            from .dpt_midas import DPTHybrid, convert_dpt_midas, detect_depth_midas

            backbone_params = convert_dpt_midas(sd)
            model = DPTHybrid()

            def backbone(p, frames, _m=model):
                return detect_depth_midas(p, frames, _m)
        elif kind == "depth_zoe":
            from .zoedepth import (
                ZoeDepthN,
                adapt_zoedepth_grid,
                convert_zoedepth,
                detect_depth_zoe,
                zoedepth_grid_for,
            )

            backbone_params = convert_zoedepth(sd)
            zmodel = ZoeDepthN()

            # the checkpoint rel-bias tables are pinned to the 24x24
            # pretraining window; resample them to each input's patch grid
            # (cached per grid — conversion-time params stay checkpoint-grid)
            _grid_cache: Dict = {}

            def backbone(p, frames, _m=zmodel, _cache=_grid_cache):
                grid = zoedepth_grid_for(frames.shape[1], frames.shape[2],
                                         _m.patch)
                if grid not in _cache:
                    _cache[grid] = adapt_zoedepth_grid(p, grid)
                return detect_depth_zoe(_cache[grid], frames, _m)
        elif kind in ("softedge_pidinet", "scribble_pidinet"):
            from .pidinet import convert_pidinet

            if "state_dict" in sd:  # table5_pidinet.pth wraps a state_dict
                sd = sd["state_dict"]
            sd = {k.replace("module.", ""): v for k, v in sd.items()}
            backbone_params = convert_pidinet(sd)
        elif kind == "openpose":
            from .openpose import convert_bodypose

            backbone_params = convert_bodypose(sd)
        elif kind == "normal_bae":
            from .normalbae import convert_normalbae

            backbone_params = convert_normalbae(sd)
    return AnnotatorEmbedder(
        kind,
        backbone=backbone,
        backbone_params=backbone_params,
        allow_fake=bool(params.get("fake_annotator", False)),
        safe=bool(params.get("safe", False)),
    )
