#!/usr/bin/env python3
"""Plot the learning-rate schedule of a training config (reference
scripts/visualization scheduler viewer)."""
import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import Mode, load_config  # noqa: E402
from deepclr_tpu.solver import make_schedule  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Plot the LR schedule.")
    parser.add_argument("config", type=str, help="training configuration (*.yaml)")
    parser.add_argument("--output", type=str, default="lr_schedule.png")
    args = parser.parse_args()

    cfg = load_config(args.config, Mode.TEST)
    schedule = make_schedule(cfg)
    max_it = cfg.optimizer.max_iterations or 100000

    steps = np.linspace(0, max_it, 2000, dtype=int)
    lrs = [schedule(int(s)) for s in steps]

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(steps, lrs)
    ax.set_xlabel("iteration")
    ax.set_ylabel("learning rate")
    ax.set_yscale("log")
    fig.savefig(args.output, bbox_inches="tight")
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
