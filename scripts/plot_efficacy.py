#!/usr/bin/env python
"""Render the training-efficacy artifact (VERDICT r3 Next #7): loss curve
from a training run's metrics.csv plus the step-1 / step-N sample grids,
copied into docs/artifacts/.

Usage: python scripts/plot_efficacy.py <logdir> [out_dir=docs/artifacts]
"""

import csv
import shutil
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    logdir = Path(sys.argv[1])
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "docs/artifacts")
    out.mkdir(parents=True, exist_ok=True)

    steps, losses = [], []
    with open(logdir / "metrics.csv") as f:
        for row in csv.DictReader(f):
            if row.get("loss"):
                steps.append(int(row["step"]))
                losses.append(float(row["loss"]))

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(steps, losses, lw=1.2, color="#4c78a8")
    # running mean to show the trend through sigma-sampling noise
    k = max(1, len(losses) // 10)
    run = [sum(losses[max(0, i - k + 1):i + 1]) / len(losses[max(0, i - k + 1):i + 1])
           for i in range(len(losses))]
    ax.plot(steps, run, lw=2.2, color="#e45756", label=f"running mean (k={k})")
    ax.set_xlabel("step")
    ax.set_ylabel("diffusion loss")
    ax.set_title("toy MNIST class-conditional diffusion "
                 "(reference mnist_cond.yaml recipe)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out / "train_efficacy_loss.png", dpi=120)
    print(f"loss curve: {out / 'train_efficacy_loss.png'} "
          f"({len(losses)} points, first {losses[0]:.4f}, "
          f"last-k mean {run[-1]:.4f})")

    images = logdir / "images"
    if images.exists():
        for p in sorted(images.glob("step*_panel.png")):
            dst = out / f"efficacy_{p.name}"
            shutil.copy(p, dst)
            print(f"grid: {dst}")
        for p in sorted(images.glob("step*_sample.gif")):
            dst = out / f"efficacy_{p.name}"
            shutil.copy(p, dst)
            print(f"sample: {dst}")


if __name__ == "__main__":
    main()
