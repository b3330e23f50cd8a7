#!/usr/bin/env python3
"""ModelNet40 error-vs-noise curves from inference output
(reference scripts/paper/modelnet40_plots.py)."""
import argparse
import os
import os.path as osp
import warnings
from typing import Dict, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import Config  # noqa: E402
from deepclr_tpu.evaluation import Evaluator, load_scenario  # noqa: E402

SCENARIO_NAME = "modelnet40_unseen"
DATASET_NAME_TEMPLATE = "test_unseen_{noise:0.2f}"
NOISE_LEVELS = [0.00, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.10]


def load_scenario_from_dir(directory: str) -> Optional[Config]:
    scenario_file = osp.join(directory, "scenario.yaml")
    if not osp.isfile(scenario_file):
        return None
    try:
        return load_scenario(scenario_file, with_method=True)
    except RuntimeError:
        warnings.warn(f"Scenario invalid: '{scenario_file}'")
        return None


def evaluate(path: str, scenario: Config) -> Dict:
    filenames = [f"{k}.txt" for k in scenario.data.keys()]
    evaluator = Evaluator.read(path, filenames)
    step_errors = evaluator.get_step_errors()

    rot, trans = [], []
    for noise in NOISE_LEVELS:
        name = DATASET_NAME_TEMPLATE.format(noise=noise)
        if name not in step_errors:
            raise RuntimeError(
                f"Dataset '{name}' not found for method '{scenario.method.name}'"
            )
        rot.append(np.rad2deg(step_errors[name].mean.rotation.chordal))
        trans.append(step_errors[name].mean.translation.kitti)
    return {"rotation": rot, "translation": trans}


def main():
    parser = argparse.ArgumentParser(
        description="Plot ModelNet40 error-vs-noise curves."
    )
    parser.add_argument("path", type=str, help="base directory of inference output")
    parser.add_argument("--output", type=str, default=None,
                        help="output directory (default: PATH/evaluation)")
    args = parser.parse_args()

    curves = {}
    for dirname in sorted(os.listdir(args.path)):
        directory = osp.join(args.path, dirname)
        if not osp.isdir(directory):
            continue
        scenario = load_scenario_from_dir(directory)
        if scenario is not None and scenario.name == SCENARIO_NAME:
            curves[scenario.method.name] = evaluate(directory, scenario)

    if not curves:
        warnings.warn("Could not find scenario.")
        return

    out_dir = args.output or osp.join(args.path, "evaluation")
    os.makedirs(out_dir, exist_ok=True)

    for metric, ylabel, fname in (
        ("rotation", "rotation error [deg]", "modelnet40_rotation_vs_noise"),
        ("translation", "translation error [m]", "modelnet40_translation_vs_noise"),
    ):
        fig, ax = plt.subplots()
        for method, data in curves.items():
            ax.plot(NOISE_LEVELS, data[metric], "o-", label=method)
        ax.set_xlabel("noise sigma [m]")
        ax.set_ylabel(ylabel)
        ax.legend()
        fig.savefig(osp.join(out_dir, f"{fname}.png"), bbox_inches="tight")
        fig.savefig(osp.join(out_dir, f"{fname}.pdf"), bbox_inches="tight")
        plt.close(fig)
    print(f"Plots written to {out_dir}")


if __name__ == "__main__":
    main()
