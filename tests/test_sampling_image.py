"""The 2D/demo image sampling surface (cli/sampling_image.py).

The sampling math itself is oracle-pinned in test_sampling_chain_parity
(image chains); these tests drive the ``sample_images`` entry the demo and
the CLI share, and pin its compile policy: sample + decode run as ONE
jitted program with --cfg_scale entering as a traced scalar argument, so a
guidance-strength sweep (the demo's most-touched widget) reuses the
compiled program instead of paying a fresh XLA compile per value.
"""

import jax
import numpy as np
import pytest

from ccedit_tpu.cli import sampling_image


def _tiny_session():
    from test_cli_pipeline import make_cli_engine

    engine = make_cli_engine()
    return engine


def _make_args(save_path, **over):
    args = sampling_image.add_image_args(
        __import__("argparse").ArgumentParser(), config_required=False
    ).parse_args([])
    args.H = args.W = 64
    args.sample_steps = 2
    args.sampler_name = "DPMPP2SAncestralSampler"
    args.num_samples = 1
    args.seed = 0
    args.save_path = save_path
    for k, v in over.items():
        setattr(args, k, v)
    return args


@pytest.fixture
def session(tmp_path):
    engine = _tiny_session()
    args = _make_args(str(tmp_path))
    batch, _ = sampling_image._make_batches(engine, args)
    params = engine.init_params(jax.random.PRNGKey(0), batch)
    return sampling_image.ImageSession(
        engine=engine, params=params, video_mode=True)


class TestSampleImages:
    def test_txt2img_writes_png_and_traces_scale(self, session, tmp_path):
        from pathlib import Path

        seen_scale_types = []
        real_sample = session.engine.sample

        def sample_spy(*a, **kw):
            seen_scale_types.append(type(kw.get("guider_scale")))
            return real_sample(*a, **kw)

        session.engine.sample = sample_spy
        args = _make_args(str(tmp_path / "out"), cfg_scale=6.0)
        outs = sampling_image.sample_images(
            session, args, save_dir=Path(tmp_path / "out"))
        assert len(outs) == 1
        assert outs[0].shape == (64, 64, 3) and outs[0].dtype == np.uint8
        assert (tmp_path / "out" / "sample_000.png").exists()
        assert seen_scale_types and all(
            issubclass(t, jax.core.Tracer) for t in seen_scale_types), (
            f"--cfg_scale reached engine.sample as {seen_scale_types}; it "
            "must be a traced jit argument so scale sweeps don't recompile")

    def test_cfg_scale_sweep_reuses_compiled_program(self, tmp_path):
        """Two FRESH sessions (= two processes) differing only in
        --cfg_scale: every backend compile of the second is a
        persistent-cache retrieval (the value is an argument, so the HLO is
        identical).  Within ONE session the contract is stronger — no
        retrace at all — covered by the warm-session test below."""
        def fresh_session():
            engine = _tiny_session()
            args = _make_args(str(tmp_path))
            batch, _ = sampling_image._make_batches(engine, args)
            params = engine.init_params(jax.random.PRNGKey(0), batch)
            return sampling_image.ImageSession(
                engine=engine, params=params, video_mode=True)

        compiles, cache_hits = [], []

        def listener(name, dur, **kw):
            if name == "/jax/core/compile/backend_compile_duration":
                compiles.append(name)
            elif name == "/jax/compilation_cache/cache_retrieval_time_sec":
                cache_hits.append(name)

        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.monitoring.register_event_duration_secs_listener(listener)
        try:
            sampling_image.sample_images(
                fresh_session(), _make_args(str(tmp_path / "a"), cfg_scale=7.5))
            compiles.clear()
            cache_hits.clear()
            sampling_image.sample_images(
                fresh_session(), _make_args(str(tmp_path / "b"), cfg_scale=2.0))
        finally:
            from jax._src import monitoring as _mon

            _mon.unregister_event_duration_listener(listener)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min)

        assert len(compiles) > 0, "expected the second request to dispatch"
        assert len(cache_hits) == len(compiles), (
            f"{len(compiles) - len(cache_hits)} of {len(compiles)} compiles "
            "in the cfg_scale sweep missed the compile cache")

    def test_warm_session_repeat_request_does_not_retrace(
            self, session, tmp_path):
        """The jitted generate wrapper is cached on the session, so a warm
        demo session serves a structurally-equal repeat request (different
        cfg_scale/seed) without re-tracing — engine.sample runs only during
        the one trace."""
        trace_calls = []
        real_sample = session.engine.sample

        def sample_spy(*a, **kw):
            trace_calls.append(1)
            return real_sample(*a, **kw)

        session.engine.sample = sample_spy
        sampling_image.sample_images(
            session, _make_args(str(tmp_path / "r1"), cfg_scale=7.5, seed=1))
        assert len(trace_calls) == 1
        sampling_image.sample_images(
            session, _make_args(str(tmp_path / "r2"), cfg_scale=5.0, seed=2))
        assert len(trace_calls) == 1, (
            "repeat request re-traced the sampler program; the generate "
            "wrapper must be cached on ImageSession")
        assert len(session.generate_cache) == 1
        # a structurally different request (other step count) traces anew
        sampling_image.sample_images(
            session, _make_args(str(tmp_path / "r3"), sample_steps=3))
        assert len(trace_calls) == 2
        assert len(session.generate_cache) == 2
