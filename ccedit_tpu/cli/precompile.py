"""Deploy-time warm-start: precompile bucket geometries into the cache.

The first request in a new (H, W, T, steps) bucket pays a 250-900 s remote
XLA compile before its first denoise row (docs/PERF_r4.md §5, PERF_r5.md §3),
and exporting compiled executables ahead of time is defeated by the tunnel
transport (PERF_r4 §5's honest AOT negative).  The remaining lever is to pay
those compiles at *deploy* time instead of on a user's first request — the
reference needs no equivalent because eager torch pays zero marginal cost per
geometry (scripts/sampling/sampling_tv2v.py:59-76 accepts any --H/--W), so
this CLI is the TPU-first half of the shape-bucketing contract in
utils/buckets.py.

It drives the REAL pipeline (`run_pipeline`) once per requested bucket over a
tiny synthetic clip.  Running the true user path — rather than hand-building
`lower().compile()` calls — is deliberate:

* **cache-key identity is guaranteed.**  Every program a user request will
  dispatch (conditioner towers, annotator, hint pyramid, the sampler scan
  and its segmented chunk/tail variants, VAE decode) is traced by the same
  closures with the same static arguments, so the persistent-cache keys
  match exactly (utils/jax_cache.py; pinned by tests/test_precompile.py).
* **each bucket is smoke-validated** while it warms: a geometry that would
  OOM or mis-tile fails here, at deploy time, not on a user.

The cost is one sample execution per bucket on top of its compile (~54 s at
the TV2V headline vs a 250-900 s compile).  Weight *values* never enter the
cache key — rule-init weights warm the same programs a real checkpoint will
use, provided the dtype flags (--bf16) match the serving configuration.

Flags are the sampling CLIs' own surface (dtype, sampler, guidance scale and
prior/sdedit/inpaint modes all change the traced program, so precompile with
the flags serving will use), plus:

    --geometries HxWxTxSTEPS[,HxWxTxSTEPS...]   buckets to warm
    --reference_mode                            warm the TVI2V (ref) pipeline
    --report out.json                           write a per-bucket report

Typical deploy warm-up (the two reference headline workloads,
README.md:50-77):

    python -m ccedit_tpu.cli.precompile --config_path <tv2v.yaml> \
        --bf16 --geometries 512x768x17x30
    python -m ccedit_tpu.cli.precompile --config_path <tvi2v.yaml> \
        --bf16 --reference_mode --geometries 512x768x17x50

In reference mode each geometry warms BOTH prior variants by default (the
direct-CLI no-prior program AND the x-prior program auto_pipeline serves
with --prior_coefficient_x 0.03); the coefficient value itself is a traced
argument, so the prior warm covers every nonzero coefficient.  Pass an
explicit nonzero --prior_coefficient_x to warm only the prior variant.
"""

from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from .pipeline import base_parser, run_pipeline

# Default warm set: the reference's own headline workloads on the bucket
# grid — 30-step TV2V and 50-step TVI2V at 512x768x17 (README.md:56-77).
DEFAULT_GEOMETRIES = {False: "512x768x17x30", True: "512x768x17x50"}


def parse_geometries(spec: str) -> List[Tuple[int, int, int, int]]:
    """'512x768x17x30,448x768x17x30' -> [(H, W, T, steps), ...]."""
    out = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        parts = item.lower().split("x")
        if len(parts) != 4:
            raise ValueError(
                f"geometry {item!r} is not HxWxTxSTEPS (e.g. 512x768x17x30)")
        out.append(tuple(int(p) for p in parts))
    if not out:
        raise ValueError("no geometries given")
    return out


def _write_synthetic_clip(dirpath: Path, t: int) -> Path:
    """A tiny deterministic frame-dir clip; the pipeline's decoder resizes it
    to the bucket (H, W), so 64x64 sources keep the warm-up host-cheap."""
    clip = dirpath / f"warmclip_t{t}"
    clip.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    rs = np.random.RandomState(0)
    for i in range(max(t, 2)):
        Image.fromarray(
            rs.randint(0, 255, size=(64, 64, 3)).astype(np.uint8)
        ).save(clip / f"frame_{i:03d}.png")
    return clip


def _write_synthetic_reference(dirpath: Path) -> Path:
    from PIL import Image

    ref = dirpath / "warmref.png"
    rs = np.random.RandomState(1)
    Image.fromarray(rs.randint(0, 255, size=(64, 64, 3)).astype(np.uint8)).save(ref)
    return ref


def precompile(args, geometries: List[Tuple[int, int, int, int]],
               reference_mode: bool = False) -> List[Dict]:
    """Warm one bucket per geometry through the real pipeline; returns the
    per-bucket report rows (also printed).

    In reference mode with the default ``--prior_coefficient_x 0``, each
    geometry is warmed TWICE: once without the x-prior branch (the direct
    sampling_tv2v_ref default) and once with it (auto_pipeline.py:55 serves
    with 0.03, a structurally different program: two encode_first_stage
    calls + the prior mix).  The coefficient VALUE is a traced argument, so
    one prior-variant warm covers every nonzero coefficient."""
    import jax

    from ..utils import buckets

    rows: List[Dict] = []
    compiles: List[float] = []
    cache_hits: List[float] = []

    def listener(name, dur, **kw):
        if name == "/jax/core/compile/backend_compile_duration":
            compiles.append(dur)
        elif name == "/jax/compilation_cache/cache_retrieval_time_sec":
            cache_hits.append(dur)

    variants = [args.prior_coefficient_x]
    if reference_mode and args.prior_coefficient_x == 0:
        variants.append(0.03)  # the auto_pipeline serving default

    jax.monitoring.register_event_duration_secs_listener(listener)
    scratch = Path(tempfile.mkdtemp(prefix="ccedit_precompile_"))
    try:
        jobs = [(g, v) for g in geometries for v in variants]
        for gi, ((h, w, t, steps), prior_x) in enumerate(jobs):
            # Mirror run_pipeline's own routing: with --exact_shapes the
            # pipeline compiles the exact geometry, so the report must not
            # claim a bucket that was never warmed.
            plan = buckets.plan_geometry(
                h, w, t, steps,
                enabled=not getattr(args, "exact_shapes", False))
            if plan.changed:
                label = plan.describe()
            elif plan.in_envelope:
                label = f"({h},{w},{t},{steps}) on-grid"
            else:
                label = (f"({h},{w},{t},{steps}) OUT-OF-ENVELOPE exact "
                         "pass-through: compiles fresh, no other request "
                         "reuses it")
            variant = f" [prior_x={prior_x}]" if len(variants) > 1 else ""
            print(f"[precompile {gi + 1}/{len(jobs)}] {label}{variant}")
            compiles.clear()
            cache_hits.clear()

            run = _clone_args(args)
            run.H, run.W = h, w
            run.num_keyframes, run.sample_steps = t, steps
            run.prior_coefficient_x = prior_x
            # stride-1 keyframe selection over the synthetic clip; fps only
            # affects decode + saved-gif timing, never the compiled program
            run.original_fps = run.target_fps = 1
            run.video_path = str(_write_synthetic_clip(scratch, t))
            run.save_path = str(scratch / f"out_{gi}")
            # exactly one device batch: the while-loop reuses the same
            # compiled program for any later num_samples
            run.num_samples = max(1, min(run.batch_size, run.num_samples))
            run.disable_check_repeat = True
            if reference_mode:
                run.reference_path = str(_write_synthetic_reference(scratch))

            t0 = time.time()
            run_pipeline(run, reference_mode=reference_mode)
            dt = time.time() - t0

            fresh = max(0, len(compiles) - len(cache_hits))
            row = {
                "requested": [h, w, t, steps],
                "bucket": [plan.h, plan.w, plan.t, plan.steps],
                "in_envelope": plan.in_envelope,
                "prior_coefficient_x": prior_x,
                "seconds": round(dt, 2),
                "backend_compiles": len(compiles),
                "cache_hits": len(cache_hits),
                "fresh_compiles": fresh,
                "compile_seconds": round(sum(compiles), 2),
            }
            rows.append(row)
            print(f"  warmed in {dt:.1f}s: {len(compiles)} program(s), "
                  f"{fresh} fresh compile(s) ({sum(compiles):.1f}s), "
                  f"{len(cache_hits)} already cached")
    finally:
        import shutil

        from jax._src import monitoring as _mon

        _mon.unregister_event_duration_listener(listener)
        shutil.rmtree(scratch, ignore_errors=True)
    return rows


def _clone_args(args):
    import argparse

    return argparse.Namespace(**vars(args))


def main():
    p = base_parser()
    p.add_argument("--geometries", type=str, default="",
                   help="comma-separated HxWxTxSTEPS buckets to warm "
                        "(default: the headline workload for the mode)")
    p.add_argument("--reference_mode", action="store_true",
                   help="warm the TVI2V (reference-frame) pipeline")
    p.add_argument("--prior_type", type=str, default="ref",
                   choices=["video", "ref", "video_ref"])
    p.add_argument("--reference_path", type=str, default="",
                   help="unused (a synthetic reference frame is generated); "
                        "accepted for flag-surface symmetry")
    p.add_argument("--report", type=str, default="",
                   help="write the per-bucket JSON report here")
    args = p.parse_args()

    spec = args.geometries or DEFAULT_GEOMETRIES[args.reference_mode]
    rows = precompile(args, parse_geometries(spec),
                      reference_mode=args.reference_mode)

    total_fresh = sum(r["fresh_compiles"] for r in rows)
    total_secs = sum(r["compile_seconds"] for r in rows)
    geoms = len({tuple(r["requested"]) for r in rows})
    print(f"[precompile] done: {geoms} geometry(ies), {len(rows)} warm "
          f"job(s), {total_fresh} fresh compile(s) totalling "
          f"{total_secs:.1f}s now persistently cached")
    if args.report:
        Path(args.report).parent.mkdir(parents=True, exist_ok=True)
        Path(args.report).write_text(json.dumps(rows, indent=1))
        print(f"[precompile] report -> {args.report}")


if __name__ == "__main__":
    main()
