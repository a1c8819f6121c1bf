"""Deploy-time precompile CLI (cli/precompile.py).

The contract under test: warming a bucket through the precompile CLI means a
LATER user request anywhere in that bucket dispatches zero fresh XLA
compiles — every backend compile is a persistent-cache retrieval.  This is
the cache-key-identity guarantee the CLI's docstring promises (it drives the
real run_pipeline, so the traced programs match the user path exactly).
"""

import jax
import numpy as np
import pytest

from ccedit_tpu.cli import pipeline, precompile


class TestParseGeometries:
    def test_single_and_list(self):
        assert precompile.parse_geometries("512x768x17x30") == [
            (512, 768, 17, 30)]
        assert precompile.parse_geometries(
            "512x768x17x30, 448x768x17x50") == [
            (512, 768, 17, 30), (448, 768, 17, 50)]

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            precompile.parse_geometries("512x768x17")
        with pytest.raises(ValueError):
            precompile.parse_geometries("")

    def test_defaults_cover_both_headline_workloads(self):
        # README.md:56-77 — 30-step TV2V and 50-step TVI2V at 512x768x17
        assert precompile.parse_geometries(
            precompile.DEFAULT_GEOMETRIES[False]) == [(512, 768, 17, 30)]
        assert precompile.parse_geometries(
            precompile.DEFAULT_GEOMETRIES[True]) == [(512, 768, 17, 50)]

    def test_clone_args_is_independent(self):
        args = pipeline.base_parser().parse_args([])
        clone = precompile._clone_args(args)
        clone.H = 12345
        assert args.H != 12345


def _patch_tiny_engine(monkeypatch):
    from test_cli_pipeline import make_cli_engine

    from ccedit_tpu.diffusion import make_discretization, make_sampler

    def fake_load_engine(a, num_steps):
        engine = make_cli_engine()
        strength = (a.sdedit_denoise_strength
                    if a.sdedit_denoise_strength > 0 else None)
        engine.sampler = make_sampler(
            pipeline.SAMPLER_NAMES[a.sampler_name],
            discretization=make_discretization(
                "legacy_ddpm",
                **({"img2img_strength": strength} if strength else {})),
            num_steps=num_steps,
        )
        return engine, {}

    monkeypatch.setattr(pipeline, "load_engine", fake_load_engine)


class TestReferenceModePrecompile:
    @pytest.mark.slow
    def test_reference_mode_warms_and_reports(self, monkeypatch, tiny_grid):
        """The TVI2V leg: precompile generates its own synthetic reference
        frame and drives run_pipeline(reference_mode=True) to completion.
        An explicit nonzero prior coefficient warms only the prior variant
        (the traced-argument coefficient covers every nonzero value)."""
        _patch_tiny_engine(monkeypatch)
        args = pipeline.base_parser().parse_args([])
        args.save_type = "gif"
        args.seed = 0
        args.prior_type = "ref"
        args.prior_coefficient_x = 0.3
        args.prior_coefficient_noise = 0.9
        rows = precompile.precompile(args, [(40, 33, 3, 2)],
                                     reference_mode=True)
        assert len(rows) == 1
        assert rows[0]["bucket"] == [64, 64, 4, 2]
        assert rows[0]["in_envelope"] is True
        assert rows[0]["prior_coefficient_x"] == 0.3
        assert rows[0]["backend_compiles"] > 0

    @pytest.mark.slow
    def test_reference_mode_default_warms_both_prior_variants(
            self, monkeypatch, tiny_grid):
        """With the default --prior_coefficient_x 0, reference mode warms
        the no-prior program (direct CLI default) AND the x-prior program
        (auto_pipeline serves with 0.03) — the serving flow's first request
        must not pay a fresh compile after a 'successful' warm."""
        _patch_tiny_engine(monkeypatch)
        args = pipeline.base_parser().parse_args([])
        args.save_type = "gif"
        args.seed = 0
        args.prior_type = "ref"
        rows = precompile.precompile(args, [(40, 33, 3, 2)],
                                     reference_mode=True)
        assert [r["prior_coefficient_x"] for r in rows] == [0.0, 0.03]
        assert all(r["bucket"] == [64, 64, 4, 2] for r in rows)


class TestPrecompileWarmsUserRequests:
    @pytest.mark.slow
    def test_warmed_bucket_serves_user_request_from_cache(
            self, monkeypatch, tiny_grid, tmp_path):
        """precompile (40, 33, T=3, 2 steps) -> bucket (64, 64, T=4); then a
        user request at (64, 50, T=2) in the SAME bucket must be served
        entirely from the persistent compile cache."""
        from test_cli_pipeline import make_args

        _patch_tiny_engine(monkeypatch)
        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            args = pipeline.base_parser().parse_args([])
            args.save_type = "gif"
            args.seed = 0
            args.num_samples = 1
            rows = precompile.precompile(args, [(40, 33, 3, 2)])
            assert rows[0]["bucket"] == [64, 64, 4, 2]
            assert rows[0]["backend_compiles"] > 0

            # the user request: different requested geometry, same bucket
            compiles, cache_hits = [], []

            def listener(name, dur, **kw):
                if name == "/jax/core/compile/backend_compile_duration":
                    compiles.append(name)
                elif name == "/jax/compilation_cache/cache_retrieval_time_sec":
                    cache_hits.append(name)

            clip_dir = tmp_path / "userclip"
            clip_dir.mkdir()
            from PIL import Image

            rs = np.random.RandomState(3)
            for i in range(4):
                Image.fromarray(rs.randint(0, 255, size=(64, 64, 3))
                                .astype(np.uint8)
                                ).save(clip_dir / f"frame_{i:03d}.png")

            jax.monitoring.register_event_duration_secs_listener(listener)
            try:
                user = make_args(str(clip_dir), str(tmp_path / "out_user"),
                                 H=64, W=50, num_keyframes=2, sample_steps=2)
                pipeline.run_pipeline(user)
            finally:
                from jax._src import monitoring as _mon

                _mon.unregister_event_duration_listener(listener)
        finally:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min)

        assert len(compiles) > 0, "expected the user request to dispatch"
        assert len(cache_hits) == len(compiles), (
            f"{len(compiles) - len(cache_hits)} of {len(compiles)} compiles "
            "in the warmed-bucket user request missed the compile cache")
