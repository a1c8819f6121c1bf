#!/usr/bin/env python
"""Regenerate the training-efficacy sample panels from a saved checkpoint.

The 200-step efficacy run's in-flight panels were written by an interim
trainer revision that passed single images where ``save_panel_grid`` expects
batches (1-px-wide frames).  The trainer code is fixed; this script re-renders
the step-N panel from the run's orbax checkpoint, plus an untrained step-0
panel from fresh-init params for contrast, without re-running training.

Usage: python scripts/regen_efficacy_panels.py <logdir> [out_dir]
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ccedit_tpu.config import build_engine, load_config
from ccedit_tpu.train.trainer import Trainer, TrainerConfig


def main():
    logdir = Path(sys.argv[1])
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "docs/artifacts")
    out.mkdir(parents=True, exist_ok=True)

    cfgs = sorted((logdir / "configs").glob("*.yaml"))
    cfg = load_config([str(c) for c in cfgs])
    eng = build_engine(cfg)

    from ccedit_tpu.data.toy import MNISTDataset

    ds = MNISTDataset(train=True)
    idx = np.arange(8)
    batch = {
        k: np.stack([ds[int(i)][k] for i in idx])
        for k in ("jpg", "cls")
    }

    trainer = Trainer(
        eng,
        TrainerConfig(logdir=str(logdir), max_steps=1, base_lr=1e-4,
                      seed=23, sample_steps=50),
    )
    params = eng.init_params(jax.random.PRNGKey(23), batch)

    # untrained panel
    trainer.log_samples(params, batch, step=0)

    # restore params only (the full train state needs the optimizer tree;
    # panels don't) and render the trained panel
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager((logdir / "checkpoints").absolute())
    latest = mngr.latest_step()
    restored = mngr.restore(
        latest,
        args=ocp.args.PyTreeRestore({"params": params}, partial_restore=True),
    )
    trainer.log_samples(restored["params"], batch, step=latest)

    import shutil

    for step in (0, latest):
        src = logdir / "images" / f"step{step:08d}_panel.png"
        dst = out / f"efficacy_step{step:08d}_panel.png"
        shutil.copy(src, dst)
        print(f"panel: {dst}")


if __name__ == "__main__":
    main()
