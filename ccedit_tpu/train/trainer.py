"""Training loop: mesh-sharded data parallelism + checkpoints + logging.

Behavioural parity targets (main.py, SURVEY.md §2.1):
  * LR scaling lr = accum * n_dev * bs * base_lr, capped at 1e-4 (:949-957)
  * grad accumulation (:943-948) — via optax.MultiSteps
  * ModelCheckpoint every N steps + resume from max-step ckpt (:791-812,
    :636-645) — via orbax
  * CSV metrics logging (:744-787)
  * crash save 'last' (melk, :1016-1022)

TPU-first: ONE jitted train step with the batch sharded over the mesh's data
axis and params replicated; XLA emits the gradient all-reduce over ICI (no
DDP/NCCL analog, SURVEY.md §2.7).
"""

from __future__ import annotations

import csv
import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.engine import CCEditEngine, TrainState
from ..parallel.mesh import MeshPlan, make_mesh


def scale_learning_rate(base_lr: float, accumulate: int, n_devices: int,
                        batch_size: int, cap: float = 1e-4) -> float:
    """main.py:949-957."""
    return min(accumulate * n_devices * batch_size * base_lr, cap)


def donation_safe() -> bool:
    """Whether to donate the train state into the jitted step.

    Donation halves peak param memory and is always on for real backends.
    The experimental 'axon' tunnel backend deterministically corrupts a
    donated TrainState (INVALID_ARGUMENT at the first post-step fetch) when
    the step executable interacts with the persistent compilation cache or
    with committed (device_put) inputs — measured 2026-08-18; bench.py's
    plain-tuple donation works, the structured-state path does not.  Override
    with CCEDIT_DONATE=1/0."""
    import os

    env = os.environ.get("CCEDIT_DONATE")
    if env is not None:
        return env not in ("0", "false", "False")
    # the tunnel identifies as platform 'tpu'; only platform_version says axon
    version = getattr(jax.devices()[0].client, "platform_version", "")
    return "axon" not in version


def assert_exact_arithmetic() -> None:
    """Refuse to train with either int8 inference path enabled: jnp.round
    has zero gradient a.e., so gradients through quantized convs/matmuls are
    silently wrong (ops/quant.py is inference-only by design), and the
    QK8 attention path would run an int8-approximate forward while its
    custom VJP differentiates the exact recompute — an inconsistent
    fwd/bwd pair."""
    from ..ops.attention import quantized_qk_enabled
    from ..ops.quant import quantized_matmul_enabled

    if quantized_matmul_enabled() or quantized_qk_enabled():
        raise RuntimeError(
            "training requires exact arithmetic: unset CCEDIT_QUANT_MATMUL/"
            "CCEDIT_QUANT_QK/CCEDIT_INT8 or call set_quantized_matmul(False)"
            " / set_quantized_qk(False) before fit()")


@dataclasses.dataclass
class TrainerConfig:
    logdir: str = "logs/run"
    max_steps: int = 1000
    ckpt_every: int = 500
    log_every: int = 10
    zero_sharding: bool = False  # ZeRO-1 optimizer-state sharding
    sample_every: int = 0  # 0 = off; the ImageLogger equivalent (main.py:326-523)
    sample_steps: int = 10
    negative_prompt: str = "ugly, low quality"
    accumulate_grad_batches: int = 1
    base_lr: float = 1e-4
    scale_lr: bool = True
    lr_cap: float = 1e-4
    seed: int = 42
    keep_ckpts: int = 3


class Trainer:
    def __init__(self, engine: CCEditEngine, cfg: TrainerConfig,
                 plan: Optional[MeshPlan] = None,
                 lr_schedule=None, init_overlay=None):
        self.engine = engine
        self.cfg = cfg
        self.plan = plan if plan is not None else make_mesh()
        self.lr_schedule = lr_schedule
        # initial-weights overlay (params -> params), applied once after
        # rule init — the reference loads model.params.ckpt_path into the
        # engine before training (diffusion.py:113-137); an orbax resume
        # checkpoint still takes precedence
        self.init_overlay = init_overlay
        self.logdir = Path(cfg.logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._csv_path = self.logdir / "metrics.csv"
        self._init_wandb()

    # -- checkpointing ------------------------------------------------
    def _ckpt_manager(self):
        import orbax.checkpoint as ocp

        return ocp.CheckpointManager(
            (self.logdir / "checkpoints").absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.cfg.keep_ckpts, create=True
            ),
        )

    def save(self, mngr, state: TrainState):
        import orbax.checkpoint as ocp

        tree = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
        if state.ema is not None:
            # the EMA shadow is part of training state (the reference's LitEma
            # buffers live in the torch checkpoint, sgm/modules/ema.py) — a
            # resume that re-seeded it from fresh-init params would silently
            # discard the averaged weights
            tree["ema_shadow"] = state.ema.shadow
            tree["ema_num_updates"] = state.ema.num_updates
        mngr.save(int(state.step), args=ocp.args.PyTreeSave(tree))

    def try_restore(self, mngr, state: TrainState) -> TrainState:
        latest = mngr.latest_step()
        if latest is None:
            return state
        import orbax.checkpoint as ocp

        base_target = {"params": state.params, "opt_state": state.opt_state,
                       "step": state.step}
        want_ema = state.ema is not None
        if want_ema:
            # first try restoring WITH the EMA leaves; a pre-EMA checkpoint
            # fails the structure match (orbax ValueError) and we fall back.
            # (Metadata introspection is orbax-version-fragile: item_metadata
            # containment checks returned False against checkpoints that DO
            # hold the shadow.)
            target = dict(base_target, ema_shadow=state.ema.shadow,
                          ema_num_updates=state.ema.num_updates)
            try:
                restored = mngr.restore(
                    latest, args=ocp.args.PyTreeRestore(target))
            except ValueError:
                want_ema = False
        if not want_ema:
            restored = mngr.restore(
                latest, args=ocp.args.PyTreeRestore(base_target))
        if state.ema is None:
            ema = None
        elif want_ema:
            ema = dataclasses.replace(
                state.ema, shadow=restored["ema_shadow"],
                num_updates=restored["ema_num_updates"])
        else:
            # pre-EMA checkpoint: re-seed the shadow from the RESTORED params
            # (not the fresh-init ones) and advance the warmup counter to the
            # restored step so the decay schedule doesn't restart
            ema = dataclasses.replace(
                state.ema,
                shadow=jax.tree_util.tree_map(
                    # copy, don't alias the restored params (aliased leaves
                    # break jit donation of the TrainState — see EmaState)
                    lambda x: jnp.array(x, copy=True),
                    self.engine.ema_subset(restored["params"]["network"])),
                num_updates=jnp.asarray(restored["step"], jnp.int32))
            print("[resume] checkpoint has no EMA shadow; re-seeded from "
                  "restored params")
        print(f"[resume] restored step {latest}")
        return TrainState(restored["params"], restored["opt_state"],
                          restored["step"], ema)

    # -- logging ------------------------------------------------------
    def _log(self, step: int, metrics: Dict):
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        write_header = not self._csv_path.exists()
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if write_header:
                w.writeheader()
            w.writerow(row)
        # structured sink (wandb-equivalent): JSONL is always written; wandb
        # itself attaches when installed + WANDB_PROJECT set (main.py logger
        # config analog, main.py:744-787)
        import json as _json

        with open(self.logdir / "metrics.jsonl", "a") as f:
            f.write(_json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(row, step=step)

    def _init_wandb(self):
        import os as _os

        self._wandb = None
        if not _os.environ.get("WANDB_PROJECT"):
            return
        try:
            import wandb

            wandb.init(project=_os.environ["WANDB_PROJECT"],
                       dir=str(self.logdir), resume="allow")
            self._wandb = wandb
        except Exception as e:
            print(f"[log] wandb unavailable ({e}); JSONL/CSV sinks only")

    # -- validation sampling (the ImageLogger / log_images equivalent,
    #    main.py:439-487 + diffusion.py:608-708) -----------------------
    def log_samples(self, params, batch: Dict, step: int, ema_shadow=None):
        """Sample from the current (or EMA) weights on a training batch's
        conditioning and save the clips next to the logs."""
        from ..data.video import save_panel_grid, save_video_frames

        eng = self.engine
        use_params = dict(params)
        if ema_shadow is not None:
            # the shadow covers only the trainable subtree (EMA of frozen
            # params is the params themselves) — reconstitute the full tree
            use_params["network"] = eng.merge_ema(params["network"], ema_shadow)
        prepared = eng.conditioner.prepare(batch)
        is_video = np.asarray(prepared[eng.input_key]).ndim == 5
        # video: first clip only; image: a small grid of samples (the
        # reference ImageLogger logs N_row images — main.py:439-487)
        n_keep = 1 if is_video else min(
            8, np.asarray(prepared[eng.input_key]).shape[0])
        prepared = {
            k: (v[:n_keep] if not isinstance(v, list) else v[:n_keep])
            for k, v in prepared.items()
        }
        c, uc = eng.conditioner.get_unconditional_conditioning(
            use_params["conditioner"], prepared, prepared
        )
        x = np.asarray(prepared[eng.input_key])[:n_keep]
        z = eng.encode_first_stage(use_params, jnp.asarray(x))
        rng = jax.random.PRNGKey(self.cfg.seed + step)
        latents = eng.sample(
            use_params, c, uc, z.shape, rng, num_steps=self.cfg.sample_steps
        )
        out_dir = self.logdir / "images"
        out_dir.mkdir(exist_ok=True)
        if not is_video:
            # image engine (toy MNIST/CIFAR): one PNG grid — inputs on top,
            # samples below; the batch axis plays the grid's frame axis
            samples = np.asarray(eng.decode_first_stage(use_params, latents))
            tile = lambda a: (np.repeat(a, 3, axis=-1)
                              if a.shape[-1] == 1 else a)
            save_panel_grid([tile(x), tile(samples)],
                            str(out_dir / f"step{step:08d}_panel.png"))
            return
        frames = np.asarray(eng.decode_first_stage(use_params, latents))[0]
        save_video_frames(frames, str(out_dir / f"step{step:08d}_sample.gif"), fps=4)
        save_video_frames(x[0], str(out_dir / f"step{step:08d}_input.gif"), fps=4)
        # conditioning-panel grid (the reference's log_images conditioning
        # rows, diffusion.py:608-708): input / hint / sample frames stacked
        panel_rows = [x[0]]
        hint = prepared.get("control_hint")
        if hint is not None and np.asarray(hint).ndim == 5:
            panel_rows.append(np.asarray(hint)[0])
        panel_rows.append(frames)
        save_panel_grid(panel_rows, str(out_dir / f"step{step:08d}_panel.png"))

    # -- main loop ----------------------------------------------------
    def fit(self, loader, batch_size: int, resume: bool = True):
        assert_exact_arithmetic()
        cfg = self.cfg
        n_dev = self.plan.n_data
        lr = (
            scale_learning_rate(cfg.base_lr, cfg.accumulate_grad_batches,
                                n_dev, batch_size, cfg.lr_cap)
            if cfg.scale_lr else cfg.base_lr
        )
        if self.lr_schedule is not None:
            # host schedules branch on Python ints and can't trace under the
            # jitted step — tabulate once and index with jnp.take instead
            from .lr_schedule import tabulate_schedule

            lr_fn = tabulate_schedule(self.lr_schedule, cfg.max_steps, lr)
        else:
            lr_fn = lr

        # one example batch to initialize
        first = next(iter(loader))
        prepared = self.engine.conditioner.prepare(first)
        params = self.engine.init_params(jax.random.PRNGKey(cfg.seed), first)
        if self.init_overlay is not None:
            params = self.init_overlay(params)
        tx = self.engine.make_optimizer(lr_fn, params)
        if cfg.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
        state = self.engine.create_train_state(params, tx)
        mngr = self._ckpt_manager()
        if resume:
            state = self.try_restore(mngr, state)

        repl = NamedSharding(self.plan.mesh, P())
        bshard = lambda nd: NamedSharding(self.plan.mesh, P("data", *([None] * (nd - 1))))

        raw_step = self.engine.make_train_step(tx)
        donate = (0,) if donation_safe() else ()

        if cfg.zero_sharding and self.plan.n_data > 1:
            # ZeRO-1: optimizer state sharded over the data axis, params
            # replicated; the jit sharding constraint keeps the state
            # partitioned across steps (XLA inserts the needed collectives)
            from ..parallel.zero import zero_shardings

            opt_shardings = zero_shardings(state.opt_state, self.plan)
            state_shardings = type(state)(
                params=jax.tree_util.tree_map(lambda _: repl, state.params),
                opt_state=opt_shardings,
                step=repl,
                ema=jax.tree_util.tree_map(lambda _: repl, state.ema),
            )
            step_fn = jax.jit(raw_step, donate_argnums=donate,
                              out_shardings=(state_shardings, None))
            state = jax.device_put(state, state_shardings)
        else:
            step_fn = jax.jit(raw_step, donate_argnums=donate)
            if self.plan.mesh.size > 1:
                state = jax.device_put(state, repl)
            # on a single-device mesh the NamedSharding commit is a semantic
            # no-op but the axon TPU backend rejects donating a committed
            # array (InvalidArgument at first fetch) — leave the state on the
            # default device and let jit donate it directly
        rng = jax.random.PRNGKey(cfg.seed + 1)

        # SIGUSR1 -> checkpoint at the next step boundary (the reference's
        # melk hook, main.py:964-982); host-side flag, signal-safe
        import signal

        usr1_flag = {"save": False}

        def _on_usr1(signum, frame):
            usr1_flag["save"] = True

        def _on_usr2(signum, frame):
            # the reference drops into pudb (main.py:975-983); headless
            # equivalent: dump all thread stacks for live diagnosis
            import faulthandler

            faulthandler.dump_traceback()

        try:
            prev_handler = signal.signal(signal.SIGUSR1, _on_usr1)
            signal.signal(signal.SIGUSR2, _on_usr2)
        except (ValueError, OSError):
            prev_handler = None  # non-main thread; hook unavailable

        t0 = time.time()
        step = int(state.step)
        try:
            while step < cfg.max_steps:
                for batch in loader:
                    if step >= cfg.max_steps:
                        break
                    prepared = self.engine.conditioner.prepare(batch)
                    device_batch = {
                        k: (jax.device_put(np.asarray(v), bshard(np.asarray(v).ndim))
                            if self.plan.mesh.size > 1
                            else jax.device_put(np.asarray(v)))
                        for k, v in prepared.items()
                        if not isinstance(v, list)
                    }
                    rng, k = jax.random.split(rng)
                    state, metrics = step_fn(state, device_batch, k)
                    step = int(state.step)
                    if step % cfg.log_every == 0:
                        loss = float(metrics["loss"])
                        dt = time.time() - t0
                        print(f"step {step}: loss {loss:.4f} ({dt:.1f}s)")
                        self._log(step, {"loss": loss, "seconds": dt})
                    if step % cfg.ckpt_every == 0 or usr1_flag["save"]:
                        self.save(mngr, state)
                        usr1_flag["save"] = False
                    # sample on the FIRST step too (the reference ImageLogger
                    # logs batch 0 before training moves the weights —
                    # main.py:326-523), so step-1-vs-step-N grids show drift
                    if cfg.sample_every and (step % cfg.sample_every == 0
                                             or step == 1):
                        try:
                            host_params = jax.device_get(state.params)
                            shadow = (
                                jax.device_get(state.ema.shadow)
                                if state.ema is not None else None
                            )
                            self.log_samples(host_params, batch, step, shadow)
                        except Exception as e:  # sampling must not kill training
                            print(f"[log_samples] failed at step {step}: {e}")
        except BaseException:
            # crash save (melk, main.py:1016-1022)
            self.save(mngr, state)
            mngr.wait_until_finished()
            raise
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGUSR1, prev_handler)
        self.save(mngr, state)
        mngr.wait_until_finished()
        return state
