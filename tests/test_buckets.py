"""Shape-bucketing compile policy (SURVEY §7.3 hard-part #5).

The key guarantee: two *different* requested geometries that land in the
same bucket run the SAME compiled program — the second request's compiles
are all served from the persistent compile cache (counted via
jax.monitoring's cache-retrieval events), so no request inside the
production envelope ever pays the 250-900 s per-new-geometry XLA compile
(docs/PERF_r4.md §5).  The reference pays zero marginal cost for new
geometry because torch is eager — but it also resizes every clip to the
requested (H, W) anyway (scripts/sampling/util.py:705-746), so the bucket
resize is the same user contract.
"""

import numpy as np
import pytest
from PIL import Image

import jax

from ccedit_tpu.cli import pipeline
from ccedit_tpu.utils.buckets import (
    pad_split,
    plan_geometry,
    snap_dim,
    snap_steps,
    snap_t,
)


class TestSnapping:
    def test_snap_dim_grid(self):
        assert snap_dim(256) == 256
        assert snap_dim(257) == 320
        assert snap_dim(500) == 512
        assert snap_dim(512) == 512
        assert snap_dim(768) == 768
        assert snap_dim(1000) == 1024
        assert snap_dim(1024) == 1024

    def test_snap_dim_out_of_envelope_passes_through(self):
        assert snap_dim(64) == 64      # debug geometry: exact
        assert snap_dim(192) == 192    # boundary: exact (64-aligned, runs)
        assert snap_dim(1025) == 1025  # exotic: exact (+fresh compile)

    def test_snap_dim_pulls_near_envelope_requests_up(self):
        """Requests within one grid step below the envelope are pulled up
        into it: they are not 64-aligned, so running them exactly crashes
        the UNet skip alignment (both frameworks) — observed live with a
        250x250 request before this rule existed."""
        assert snap_dim(255) == 256
        assert snap_dim(250) == 256
        assert snap_dim(193) == 256

    def test_snap_t(self):
        assert snap_t(8) == 8
        assert snap_t(10) == 12
        assert snap_t(12) == 12
        assert snap_t(13) == 17
        assert snap_t(17) == 17
        assert snap_t(18) == 25
        assert snap_t(33) == 33
        assert snap_t(3) == 3    # below envelope: exact
        assert snap_t(34) == 34  # above envelope: exact

    def test_snap_steps_nearest_ties_up(self):
        assert snap_steps(10) == 10
        assert snap_steps(12) == 10
        assert snap_steps(15) == 20  # tie rounds up (quality over latency)
        assert snap_steps(25) == 30
        assert snap_steps(30) == 30
        assert snap_steps(45) == 50
        assert snap_steps(50) == 50
        assert snap_steps(2) == 2    # debug: exact
        assert snap_steps(51) == 51

    def test_pad_split_center_alignment(self):
        """The padded clip's center frame must be the request's center frame
        for every in-envelope T: the TVI2V appearance injection targets
        frame T//2 (controlmodel.py:529-531) and CFCA anchors on it."""
        for t_req in range(1, 34):
            t_b = snap_t(t_req)
            pad_l, pad_r = pad_split(t_req, t_b)
            assert pad_l + t_req + pad_r == t_b
            assert pad_l + t_req // 2 == t_b // 2

    def test_reference_workloads_already_on_grid(self):
        """The two README workloads (17f 512x768 @30/50 steps) must map to
        themselves — bucketing changes nothing for the headline paths."""
        for steps in (30, 50):
            p = plan_geometry(512, 768, 17, steps)
            assert not p.changed

    def test_snap_hw_token_alignment(self):
        """Buckets must keep the latent token count 128-aligned: the flash
        kernel gate (ops/attention.py _flash_ok) needs %128 sequence
        lengths; the XLA fallback OOMs at SD scale (measured 448x704 ->
        26.8 GB score allocation)."""
        from ccedit_tpu.utils.buckets import snap_hw

        # 448x704: both /64-odd -> 4928 tokens (%128=64): bump larger side
        assert snap_hw(448, 704) == (448, 768)
        assert snap_hw(704, 448) == (768, 448)
        # requests inside the envelope always land token-aligned
        for h in range(256, 1025, 32):
            for w in range(256, 1025, 32):
                bh, bw = snap_hw(h, w)
                assert ((bh // 8) * (bw // 8)) % 128 == 0, (h, w, bh, bw)
        # already-aligned geometries unchanged
        assert snap_hw(512, 768) == (512, 768)
        assert snap_hw(384, 512) == (384, 512)
        # out-of-envelope: exact passthrough, no alignment rewriting
        assert snap_hw(192, 192) == (192, 192)
        # near-envelope requests are pulled up (see snap_dim)
        assert snap_hw(200, 200) == (256, 256)


class TestPlanOps:
    def test_pad_and_restore_roundtrip(self):
        plan = plan_geometry(300, 300, 10, 30)
        # (320, 320) is 1600 latent tokens (%128 = 64) -> W bumped to 384
        assert (plan.h, plan.w, plan.t) == (320, 384, 12)
        clip = np.random.RandomState(0).randint(
            0, 255, size=(10, 320, 384, 3), dtype=np.uint8)
        padded = plan.pad_frames(clip)
        assert padded.shape == (12, 320, 384, 3)
        pad_l, _ = plan.t_pad
        # edge padding replicates the boundary keyframes
        assert np.array_equal(padded[0], clip[0])
        assert np.array_equal(padded[-1], clip[-1])
        assert np.array_equal(padded[pad_l:pad_l + 10], clip)
        # center alignment: padded center frame IS the request center frame
        assert np.array_equal(padded[12 // 2], clip[10 // 2])
        restored = plan.restore_clip(padded)
        assert restored.shape == (10, 300, 300, 3)
        # the T crop is exact; only H/W go through the bicubic resize
        ref = np.stack([
            np.asarray(Image.fromarray(f).resize((300, 300), Image.BICUBIC))
            for f in clip])
        assert np.array_equal(restored, ref)

    def test_identity_plan_is_free(self):
        plan = plan_geometry(512, 768, 17, 30)
        clip = np.zeros((17, 512, 768, 3), np.uint8)
        assert plan.pad_frames(clip) is clip
        assert plan.restore_clip(clip).shape == clip.shape

    def test_disabled_plan_passes_everything(self):
        plan = plan_geometry(300, 300, 10, 29, enabled=False)
        assert not plan.changed

    def test_out_of_envelope_hw_passes_whole_request_through(self):
        # An exotic (H, W) is its own program no matter what T/steps do;
        # snapping them would change the user's quality knobs for no
        # reuse, against the header's out-of-envelope contract.
        for h, w in ((1100, 512), (192, 192), (2048, 2048)):
            plan = plan_geometry(h, w, 10, 25)
            assert not plan.changed, (h, w, plan)

    def test_in_envelope_property_distinguishes_passthrough_from_on_grid(self):
        # All these plans are unchanged; only the first is a reusable grid
        # bucket.  Deploy tooling (cli/precompile.py) reports the difference
        # so an exact-pass-through compile is never mistaken for a warmed
        # shared bucket.
        assert plan_geometry(512, 768, 17, 30).in_envelope
        assert not plan_geometry(2048, 2048, 17, 30).in_envelope
        # --exact_shapes: in-range but misaligned (H, W) is its own program
        assert not plan_geometry(500, 500, 17, 30, enabled=False).in_envelope
        # out-of-grid T or steps also makes the program unique
        assert not plan_geometry(512, 768, 40, 30).in_envelope
        assert not plan_geometry(512, 768, 17, 60).in_envelope

    def test_in_envelope_hw_with_out_of_grid_t_still_snaps_hw(self):
        # T=40 is above T_GRID: that axis passes through, but the H/W
        # snap still applies (skip/token alignment + reuse among
        # same-T requests).
        plan = plan_geometry(300, 300, 40, 30)
        assert (plan.h, plan.w) == (320, 384)
        assert plan.t == 40 and plan.steps == 30


class TestNoRecompile:
    @pytest.mark.slow
    def test_same_bucket_requests_share_compiled_programs(
            self, monkeypatch, tiny_grid, tmp_path):
        """Two pipeline invocations at DIFFERENT requested geometries that
        snap to the same bucket: every compile the second invocation issues
        must be served from the persistent compile cache (zero fresh XLA
        compiles), and its outputs must come back at ITS requested geometry.
        """
        from test_cli_pipeline import make_args, run_with_tiny_engine

        # a 4-frame 64x64 clip fixture
        clip_dir = tmp_path / "clip"
        clip_dir.mkdir()
        rs = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray(
                rs.randint(0, 255, size=(64, 64, 3)).astype(np.uint8)
            ).save(clip_dir / f"frame_{i:03d}.png")

        compiles, cache_hits = [], []
        saved = {}

        real_save = pipeline.save_video_frames

        def spy_save(frames, path, **kw):
            saved[path] = np.asarray(frames).shape
            return real_save(frames, path, **kw)

        monkeypatch.setattr(pipeline, "save_video_frames", spy_save)

        def listener(name, dur, **kw):
            if name == "/jax/core/compile/backend_compile_duration":
                compiles.append(name)
            elif name == "/jax/compilation_cache/cache_retrieval_time_sec":
                cache_hits.append(name)

        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.monitoring.register_event_duration_secs_listener(listener)
        try:
            # request A: (40, 33, T=3) -> bucket (64, 64, T=4)
            args_a = make_args(str(clip_dir), str(tmp_path / "out_a"),
                               H=40, W=33, num_keyframes=3)
            run_with_tiny_engine(monkeypatch, args_a)

            compiles.clear()
            cache_hits.clear()

            # request B: (64, 50, T=2) -> the SAME bucket
            args_b = make_args(str(clip_dir), str(tmp_path / "out_b"),
                               H=64, W=50, num_keyframes=2)
            run_with_tiny_engine(monkeypatch, args_b)
        finally:
            from jax._src import monitoring as _mon

            _mon.unregister_event_duration_listener(listener)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min)

        # B re-traces (fresh jit closures) but every backend compile request
        # is a persistent-cache retrieval — no fresh XLA compilation
        assert len(compiles) > 0, "expected the second request to dispatch"
        assert len(cache_hits) == len(compiles), (
            f"{len(compiles) - len(cache_hits)} of {len(compiles)} compiles "
            "in the same-bucket request missed the compile cache")

        # and B's outputs are restored to B's requested geometry: 2 frames
        # at (64, 50), not the bucket's (4, 64, 64).  Assert on the arrays
        # handed to the writer — gif encoders may collapse repeated frames,
        # so the on-disk frame count is not a reliable probe.
        sample_key = next(p for p in saved if "out_b" in p and "_00" in p)
        assert saved[sample_key] == (2, 64, 50, 3), saved
