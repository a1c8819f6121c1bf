"""Training CLI — the main.py equivalent.

    python -m ccedit_tpu.cli.train -b config1.yaml config2.yaml \
        [key.sub=value ...] --name run1 --max_steps 10000

Behavioural parity targets (main.py): -b config merge + dotlist overrides
(:711-713), name/logdir derivation (:656-686), LR scaling (:949-957),
resume (-r) (:621-655), seed (:690).
"""

from __future__ import annotations

import argparse
import datetime
import sys
from pathlib import Path

import jax

from ..utils.jax_cache import enable_compilation_cache

enable_compilation_cache()


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[], help="config yaml(s), merged left-to-right")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="", help="logdir to resume")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=None, help="override data batch size")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_every", type=int, default=0,
                   help="log sample grids every N steps (0=off; also logs "
                        "at step 1 — the ImageLogger equivalent)")
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--scale_lr", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--mesh_data", type=int, default=None, help="data-parallel mesh size")
    p.add_argument("--synthetic_data", action="store_true",
                   help="use the synthetic toy video dataset")
    p.add_argument("--init_ckpt", type=str, default="",
                   help="initial weights: a torch checkpoint "
                        "(.ckpt/.pt/.safetensors, converted through "
                        "io/torch_convert) or an orbax params directory; "
                        "overrides the config's model.params.ckpt_path "
                        "(reference semantics: diffusion.py:113-137)")
    p.add_argument("--tokenizer_assets", type=str, default="")
    args, unknown = p.parse_known_args(argv)
    overrides = [u for u in unknown if "=" in u and not u.startswith("-")]
    return args, overrides


def build_dataloader(cfg, args):
    from ..data.dataset import DataLoader, SyntheticVideoDataset, WebVidDataset

    data_target = str((cfg.get("data") or {}).get("target") or "")
    data_cfg = (cfg.get("data") or {}).get("params") or {}
    train_cfg = ((data_cfg.get("train") or {}).get("params")) or {}
    bs = args.batch_size or data_cfg.get("batch_size", 1)

    if "mnist" in data_target.lower() or "cifar" in data_target.lower():
        # toy image configs (sgm/data/mnist.py, cifar10.py): on-disk
        # IDX/pickle readers with a synthetic class-correlated fallback
        from ..data.toy import build_toy_dataset

        ds = build_toy_dataset(data_target, data_cfg, train=True,
                               seed=args.seed)
        return DataLoader(ds, batch_size=bs, seed=args.seed), bs

    if args.synthetic_data or not train_cfg:
        ds = SyntheticVideoDataset(
            n_items=64,
            num_frames=train_cfg.get("video_length", 8),
            size_hw=(64, 64),
            seed=args.seed,
        )
    else:
        ds = WebVidDataset(
            data_root=train_cfg.get("data_root", "."),
            csv_path=train_cfg["csv_path"],
            num_frames=train_cfg.get("video_length", 9),
            size_hw=tuple(train_cfg.get("resolution", (256, 384))),
            seed=args.seed,
        )
    return DataLoader(ds, batch_size=bs, seed=args.seed), bs


def make_init_overlay(engine, ckpt: str):
    """Initial-weights loader for the trainer (the reference applies
    model.params.ckpt_path at engine init, diffusion.py:113-137).  Accepts
    a torch checkpoint file (4-family converter) or an orbax params
    directory; a missing path (e.g. the shipped configs' /PATH/TO/YOUR/
    CHECKPOINT placeholders) falls back to rule init with a note."""
    if not ckpt:
        return None
    p = Path(ckpt)
    if not p.exists():
        print(f"[init] ckpt_path {ckpt!r} not found; training from rule init")
        return None
    from .pipeline import _convert_ckpt, _merge_params

    def load(params):
        if not p.is_dir():
            return _convert_ckpt(engine, str(p))
        import orbax.checkpoint as ocp

        # Target-free restore returns whatever subtree is on disk, so a
        # partial checkpoint (e.g. just the controlnet) merges non-strictly
        # like the torch branch instead of failing structure validation.
        return ocp.StandardCheckpointer().restore(p.absolute())

    def overlay(params):
        merged = _merge_params(params, load(params))
        if "vae" in merged:
            engine._wire_vae_embedders(merged["vae"])
        return merged

    return overlay


def main(argv=None):
    args, overrides = parse_args(argv)

    from ..config import build_engine, build_lr_scheduler, load_config
    from ..parallel.mesh import make_mesh
    from ..train.trainer import Trainer, TrainerConfig

    if args.resume:
        logdir = Path(args.resume)
        cfgs = sorted((logdir / "configs").glob("*.yaml"))
        cfg = load_config([str(c) for c in cfgs] + args.base, overrides)
    else:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        name = args.name or (Path(args.base[0]).stem if args.base else "run")
        logdir = Path(args.logdir) / f"{now}_{name}"
        cfg = load_config(args.base, overrides)
        (logdir / "configs").mkdir(parents=True, exist_ok=True)
        import yaml

        (logdir / "configs" / "merged.yaml").write_text(yaml.safe_dump(cfg))

    engine = build_engine(cfg, asset_dir=args.tokenizer_assets or None)
    loader, bs = build_dataloader(cfg, args)

    n_dev = args.mesh_data or len(jax.devices())
    plan = make_mesh(jax.devices()[:n_dev], data=n_dev, model=1)

    model_params = (cfg.get("model") or {}).get("params") or {}
    base_lr = float(model_params.get("base_learning_rate", 1e-4))
    # the recipe's LR schedule (e.g. LambdaLinearScheduler 100-step warmup
    # in the tv2v config) — main.py hands these to LambdaLR; the trainer
    # tabulates them into a jit-traceable optax schedule
    lr_schedule = build_lr_scheduler(model_params.get("scheduler_config"))
    init_overlay = make_init_overlay(
        engine, args.init_ckpt or str(model_params.get("ckpt_path") or ""))

    trainer = Trainer(
        engine,
        TrainerConfig(
            logdir=str(logdir),
            max_steps=args.max_steps,
            ckpt_every=args.ckpt_every,
            log_every=args.log_every,
            sample_every=args.sample_every,
            accumulate_grad_batches=args.accumulate_grad_batches,
            base_lr=base_lr,
            scale_lr=args.scale_lr,
            seed=args.seed,
        ),
        plan=plan,
        lr_schedule=lr_schedule,
        init_overlay=init_overlay,
    )
    state = trainer.fit(loader, batch_size=bs, resume=bool(args.resume))
    print(f"training done at step {int(state.step)}; logs in {logdir}")


if __name__ == "__main__":
    main()
