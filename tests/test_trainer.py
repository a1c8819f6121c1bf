"""Trainer integration: 8-virtual-device data-parallel smoke training with
checkpoint save/resume — multi-device coverage the torch reference never had
(SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from ccedit_tpu.data.dataset import DataLoader, SyntheticVideoDataset
from ccedit_tpu.parallel.mesh import make_mesh
from ccedit_tpu.train.trainer import Trainer, TrainerConfig, scale_learning_rate
from test_engine import make_tiny_engine


class TestLrScaling:
    def test_formula_and_cap(self):
        assert scale_learning_rate(1e-5, 2, 4, 2, cap=1e-4) == pytest.approx(1.6e-4 if 1.6e-4 < 1e-4 else 1e-4)
        assert scale_learning_rate(1e-6, 1, 1, 4, cap=1e-4) == pytest.approx(4e-6)


class TestTrainerSmoke:
    @pytest.mark.slow
    def test_data_parallel_training_with_resume(self, tmp_path):
        assert len(jax.devices()) == 8
        engine = make_tiny_engine(freeze="none")
        # synthetic 16x16 clips; control_hint must be 8x the f=2 latent res
        ds = SyntheticVideoDataset(n_items=16, num_frames=2, size_hw=(16, 16))

        class HintFix:
            """Adapt synthetic samples to the tiny engine's embedder keys."""

            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = ds[i]
                t = s["jpg"].shape[0]
                hint = np.repeat(np.repeat(s["jpg"], 4, axis=1), 4, axis=2)
                return {
                    "jpg": s["jpg"],
                    "txt_emb": np.zeros((7, 16), dtype=np.float32),
                    "control_hint": hint,
                }

        loader = DataLoader(HintFix(), batch_size=8, seed=0)
        plan = make_mesh(jax.devices(), data=8, model=1)
        trainer = Trainer(
            engine,
            TrainerConfig(
                logdir=str(tmp_path / "run"), max_steps=2, ckpt_every=2,
                log_every=1, base_lr=1e-4, scale_lr=False, seed=0,
            ),
            plan=plan,
        )
        state = trainer.fit(loader, batch_size=8, resume=False)
        assert int(state.step) == 2
        assert (tmp_path / "run" / "metrics.csv").exists()
        assert (tmp_path / "run" / "checkpoints").exists()

        # resume continues from step 2
        trainer2 = Trainer(
            engine,
            TrainerConfig(
                logdir=str(tmp_path / "run"), max_steps=3, ckpt_every=10,
                log_every=1, base_lr=1e-4, scale_lr=False, seed=0,
            ),
            plan=plan,
        )
        state2 = trainer2.fit(loader, batch_size=8, resume=True)
        assert int(state2.step) == 3

    @pytest.mark.slow
    def test_resume_restores_ema_shadow(self, tmp_path):
        """The EMA shadow is training state: a resume must restore the saved
        averaged weights, NOT re-seed from fresh-init params (the reference
        keeps LitEma buffers in the torch checkpoint, sgm/modules/ema.py).

        Single-device plan ON PURPOSE: checkpoint round-trip is
        mesh-independent (the 8-device mesh is covered by the resume test
        above), and the EMA ops push the per-device pre-collective segment
        past XLA:CPU's hard 40 s cross-module rendezvous window on a 1-core
        host (7/8 threads arrive -> Fatal abort; observed on this round's
        migrated container)."""
        engine = make_tiny_engine(freeze="none")
        engine.use_ema = True
        ds = SyntheticVideoDataset(n_items=16, num_frames=2, size_hw=(16, 16))

        class HintFix:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = ds[i]
                hint = np.repeat(np.repeat(s["jpg"], 4, axis=1), 4, axis=2)
                return {"jpg": s["jpg"],
                        "txt_emb": np.zeros((7, 16), dtype=np.float32),
                        "control_hint": hint}

        loader = DataLoader(HintFix(), batch_size=8, seed=0)
        plan = make_mesh(jax.devices()[:1], data=1, model=1)
        cfg = dict(logdir=str(tmp_path / "run"), max_steps=2, ckpt_every=2,
                   log_every=1, base_lr=1e-1, scale_lr=False, seed=0)
        trainer = Trainer(engine, TrainerConfig(**cfg), plan=plan)
        state = trainer.fit(loader, batch_size=8, resume=False)
        assert state.ema is not None and int(state.ema.num_updates) == 2
        want = jax.tree_util.tree_leaves(jax.device_get(state.ema.shadow))

        # resume at max_steps == saved step: fit restores and exits without
        # stepping, so the returned EMA must be byte-identical to the saved one
        trainer2 = Trainer(engine, TrainerConfig(**cfg), plan=plan)
        state2 = trainer2.fit(loader, batch_size=8, resume=True)
        assert int(state2.ema.num_updates) == 2
        got = jax.tree_util.tree_leaves(jax.device_get(state2.ema.shadow))
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
        # and it is NOT the fresh-init shadow (lr was large enough to move
        # the params in 2 steps)
        fresh = engine.ema_subset(
            jax.device_get(state2.params)["network"])
        fresh_leaves = jax.tree_util.tree_leaves(fresh)
        assert any(
            not np.array_equal(np.asarray(w), np.asarray(f))
            for w, f in zip(want, fresh_leaves)
        )


class TestLrSchedules:
    def test_tabulated_schedule_matches_host_values(self):
        from ccedit_tpu.train.lr_schedule import LambdaLinearScheduler, tabulate_schedule

        sched = LambdaLinearScheduler(
            warm_up_steps=[4], f_min=[0.1], f_max=[1.0], f_start=[0.0],
            cycle_lengths=[20],
        )
        fn = tabulate_schedule(sched, num_steps=20, base_lr=2.0)
        for n in [0, 1, 4, 10, 20]:
            assert float(fn(n)) == pytest.approx(2.0 * sched(n), rel=1e-6)
        # past-the-end steps clamp instead of erroring
        assert float(fn(35)) == pytest.approx(2.0 * sched(20), rel=1e-6)
        # traceable under jit (the raw schedule is not)
        assert float(jax.jit(fn)(3)) == pytest.approx(2.0 * sched(3), rel=1e-6)

    @pytest.mark.slow
    def test_trainer_runs_jitted_steps_with_lambda_linear(self, tmp_path):
        from ccedit_tpu.train.lr_schedule import LambdaLinearScheduler

        engine = make_tiny_engine(freeze="none")
        ds = SyntheticVideoDataset(n_items=16, num_frames=2, size_hw=(16, 16))

        class HintFix:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = ds[i]
                hint = np.repeat(np.repeat(s["jpg"], 4, axis=1), 4, axis=2)
                return {
                    "jpg": s["jpg"],
                    "txt_emb": np.zeros((7, 16), dtype=np.float32),
                    "control_hint": hint,
                }

        loader = DataLoader(HintFix(), batch_size=8, seed=0)
        # single-device: the tabulated-schedule ops grow the per-device
        # pre-collective segment past XLA:CPU's 40 s cross-module rendezvous
        # window on a 1-core host (see test_resume_restores_ema_shadow)
        plan = make_mesh(jax.devices()[:1], data=1, model=1)
        sched = LambdaLinearScheduler(
            warm_up_steps=[2], f_min=[1.0], f_max=[1.0], f_start=[1e-6],
            cycle_lengths=[100],
        )
        trainer = Trainer(
            engine,
            TrainerConfig(
                logdir=str(tmp_path / "run"), max_steps=3, ckpt_every=10,
                log_every=1, base_lr=1e-4, scale_lr=False, seed=0,
            ),
            plan=plan,
            lr_schedule=sched,
        )
        state = trainer.fit(loader, batch_size=8, resume=False)
        assert int(state.step) == 3


class TestValidationSampling:
    @pytest.mark.slow
    def test_log_samples_writes_gifs(self, tmp_path):
        engine = make_tiny_engine(freeze="none")
        ds = SyntheticVideoDataset(n_items=8, num_frames=2, size_hw=(16, 16))

        class HintFix:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = ds[i]
                hint = np.repeat(np.repeat(s["jpg"], 4, axis=1), 4, axis=2)
                return {
                    "jpg": s["jpg"],
                    "txt_emb": np.zeros((7, 16), dtype=np.float32),
                    "control_hint": hint,
                }

        loader = DataLoader(HintFix(), batch_size=8, seed=0)
        plan = make_mesh(jax.devices(), data=8, model=1)
        trainer = Trainer(
            engine,
            TrainerConfig(
                logdir=str(tmp_path / "run"), max_steps=1, ckpt_every=5,
                log_every=1, sample_every=1, sample_steps=2,
                base_lr=1e-4, scale_lr=False, seed=0,
            ),
            plan=plan,
        )
        trainer.fit(loader, batch_size=8, resume=False)
        imgs = list((tmp_path / "run" / "images").glob("*.gif"))
        assert len(imgs) >= 2  # sample + input


class TestZeroSharding:
    def test_zero1_matches_replicated(self):
        """ZeRO-1 sharded optimizer state must produce the same training
        trajectory as replicated state (SURVEY.md §2.7 ZeRO row)."""
        import jax
        import numpy as np

        from ccedit_tpu.parallel.zero import apply_zero, zero_shardings
        from ccedit_tpu.parallel.mesh import make_mesh

        plan = make_mesh()
        assert plan.n_data > 1, "test expects the 8-device CPU mesh"
        import optax

        params = {"w": jax.numpy.ones((16, 8)), "b": jax.numpy.zeros((3,))}
        tx = optax.adam(1e-2)
        opt = tx.init(params)
        sharded = apply_zero(opt, plan)
        # placement: the (16,8) moment tensors split over data; scalars whole
        specs = jax.tree_util.tree_map(lambda s: s.spec, zero_shardings(opt, plan))
        flat = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: hasattr(x, "index"))

        def step(p, o, g):
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2

        g = {"w": jax.numpy.full((16, 8), 0.5), "b": jax.numpy.full((3,), 0.1)}
        p_ref, o_ref = step(params, opt, g)
        p_sh, o_sh = jax.jit(step)(params, sharded, g)
        np.testing.assert_allclose(np.asarray(p_sh["w"]), np.asarray(p_ref["w"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p_sh["b"]), np.asarray(p_ref["b"]),
                                   rtol=1e-6)

    @pytest.mark.slow
    def test_zero_sharded_trainer_fit(self, tmp_path):
        """fit() with zero_sharding=True runs jitted steps on the 8-dev mesh
        and produces finite loss (ZeRO-1 state partitioning end-to-end)."""
        engine = make_tiny_engine(freeze="none")
        ds = SyntheticVideoDataset(n_items=8, num_frames=2, size_hw=(16, 16))

        class HintFix:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = ds[i]
                hint = np.repeat(np.repeat(s["jpg"], 4, axis=1), 4, axis=2)
                return {"jpg": s["jpg"],
                        "txt_emb": np.zeros((7, 16), dtype=np.float32),
                        "control_hint": hint}

        loader = DataLoader(HintFix(), batch_size=8, seed=0)
        plan = make_mesh(jax.devices(), data=8, model=1)
        trainer = Trainer(
            engine,
            TrainerConfig(logdir=str(tmp_path / "zrun"), max_steps=2,
                          ckpt_every=10, log_every=1, base_lr=1e-4,
                          scale_lr=False, seed=0, zero_sharding=True),
            plan=plan,
        )
        state = trainer.fit(loader, batch_size=8, resume=False)
        assert int(state.step) == 2


class TestInitOverlay:
    """Initial-weights loading for training (the reference applies
    model.params.ckpt_path at engine init, diffusion.py:113-137)."""

    def test_orbax_dir_overlay(self, tmp_path):
        import orbax.checkpoint as ocp

        from ccedit_tpu.cli.train import make_init_overlay

        params = {
            "network": {"a": np.zeros((2, 2), np.float32),
                        "b": np.full((3,), 7.0, np.float32)},
            "conditioner": {"clip": {"w": np.zeros((4,), np.float32)}},
        }
        saved = {
            "network": {"a": np.ones((2, 2), np.float32),
                        "b": np.full((3,), 5.0, np.float32)},
            "conditioner": {"clip": {"w": np.arange(4, dtype=np.float32)}},
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save((tmp_path / "init").absolute(), saved)
        ckptr.wait_until_finished()

        overlay = make_init_overlay(None, str(tmp_path / "init"))
        out = overlay(params)
        assert np.array_equal(out["network"]["a"], saved["network"]["a"])
        assert np.array_equal(out["conditioner"]["clip"]["w"],
                              saved["conditioner"]["clip"]["w"])

    def test_orbax_dir_overlay_rewires_vae_embedders(self, tmp_path):
        # The conditioner's VAEEmbedders capture the VAE params at
        # engine.init_params; loading initial weights afterwards must
        # re-wire them to the LOADED vae or cond_img conditioning would
        # silently encode with rule-init weights (engine.py:149).
        import orbax.checkpoint as ocp

        from ccedit_tpu.cli.train import make_init_overlay

        params = {"vae": {"w": np.zeros((2,), np.float32)}}
        saved = {"vae": {"w": np.ones((2,), np.float32)}}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save((tmp_path / "init").absolute(), saved)
        ckptr.wait_until_finished()

        class FakeEngine:
            wired = None

            def _wire_vae_embedders(self, vae_params):
                self.wired = vae_params

        eng = FakeEngine()
        out = make_init_overlay(eng, str(tmp_path / "init"))(params)
        assert eng.wired is not None
        assert np.array_equal(eng.wired["w"], saved["vae"]["w"])
        assert np.array_equal(out["vae"]["w"], saved["vae"]["w"])

    def test_orbax_dir_overlay_accepts_partial_checkpoint(self, tmp_path):
        # A checkpoint holding only a SUBTREE of the param tree (e.g. just
        # the controlnet) must merge non-strictly like the torch branch
        # (diffusion.py:130-137 non-strict load), not fail orbax structure
        # validation.
        import orbax.checkpoint as ocp

        from ccedit_tpu.cli.train import make_init_overlay

        params = {"network": {"w": np.zeros((2,), np.float32)},
                  "conditioner": {"clip": {"w": np.zeros((3,), np.float32)}}}
        saved = {"network": {"w": np.ones((2,), np.float32)}}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save((tmp_path / "init").absolute(), saved)
        ckptr.wait_until_finished()

        class FakeEngine:
            def _wire_vae_embedders(self, vae_params):
                pass

        out = make_init_overlay(FakeEngine(), str(tmp_path / "init"))(params)
        assert np.array_equal(out["network"]["w"], saved["network"]["w"])
        # the un-checkpointed subtree keeps its rule init
        assert np.array_equal(out["conditioner"]["clip"]["w"],
                              params["conditioner"]["clip"]["w"])

    def test_orbax_dir_overlay_skips_none_leaves(self, tmp_path):
        # Real engine trees contain None leaves (param-less embedders,
        # conditioning/embedders.py); a full saved tree restores them back
        # as None and the merge must skip them, not call .shape on None.
        import orbax.checkpoint as ocp

        from ccedit_tpu.cli.train import make_init_overlay

        params = {"network": {"w": np.zeros((2,), np.float32)},
                  "conditioner": {"embedder_0": None}}
        saved = {"network": {"w": np.ones((2,), np.float32)},
                 "conditioner": {"embedder_0": None}}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save((tmp_path / "init").absolute(), saved)
        ckptr.wait_until_finished()

        class FakeEngine:
            def _wire_vae_embedders(self, vae_params):
                pass

        out = make_init_overlay(FakeEngine(), str(tmp_path / "init"))(params)
        assert np.array_equal(out["network"]["w"], saved["network"]["w"])
        assert out["conditioner"]["embedder_0"] is None

    def test_missing_path_falls_back_to_rule_init(self):
        from ccedit_tpu.cli.train import make_init_overlay

        # the shipped configs carry /PATH/TO/YOUR/CHECKPOINT placeholders
        assert make_init_overlay(None, "/PATH/TO/YOUR/CHECKPOINT") is None
        assert make_init_overlay(None, "") is None
