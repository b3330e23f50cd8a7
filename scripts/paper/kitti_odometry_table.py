#!/usr/bin/env python3
"""Regenerate the KITTI odometry results table from inference output
(reference scripts/paper/kitti_odometry_table.py: per-sequence t/r RMSE +
mean inference time for scenario kitti_04_10)."""
import argparse
import os
import os.path as osp
import warnings
from typing import Optional

import numpy as np
import pandas as pd

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import Config
from deepclr_tpu.evaluation import Evaluator, load_scenario

SCENARIO_NAME = "kitti_04_10"
METHOD_NAME = "DEEPCLR"


def load_scenario_from_dir(directory: str) -> Optional[Config]:
    scenario_file = osp.join(directory, "scenario.yaml")
    if not osp.isfile(scenario_file):
        return None
    try:
        return load_scenario(scenario_file, with_method=True)
    except RuntimeError:
        warnings.warn(f"Scenario invalid: '{scenario_file}'")
        return None


def evaluate(path: str, scenario: Config) -> None:
    filenames = [f"{k}.txt" for k in scenario.data.keys()]
    evaluator = Evaluator.read(path, filenames)

    step_errors = evaluator.get_step_errors()
    total = evaluator.get_total_step_errors()

    data = {
        seq: {
            "t_rmse [m]": metrics.mean.translation.rmse,
            "r_rmse [deg]": np.rad2deg(metrics.mean.rotation.rmse),
        }
        for seq, metrics in step_errors.items()
    }
    print("== DeepCLR Results on KITTI Odometry ==")
    print(pd.DataFrame(data).transpose())
    print()
    print(f"Average Inference Time: {total.mean.time:.2f} ms")


def main():
    parser = argparse.ArgumentParser(
        description="Print table for KITTI odometry evaluation."
    )
    parser.add_argument("path", type=str, help="base directory of inference output")
    args = parser.parse_args()

    found = False
    for dirname in sorted(os.listdir(args.path)):
        directory = osp.join(args.path, dirname)
        if not osp.isdir(directory):
            continue
        scenario = load_scenario_from_dir(directory)
        if (scenario is not None and scenario.name == SCENARIO_NAME
                and scenario.method.name == METHOD_NAME):
            evaluate(directory, scenario)
            found = True
            break
    if not found:
        warnings.warn("Could not find scenario.")


if __name__ == "__main__":
    main()
