#!/usr/bin/env python3
"""Regenerate the artificial-KITTI-pairs table (DeepVCP protocol) from
inference output (reference scripts/paper/kitti_artificial_table.py)."""
import argparse
import os
import os.path as osp
import warnings
from typing import Dict, Optional

import numpy as np
import pandas as pd

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import Config
from deepclr_tpu.evaluation import Evaluator, load_scenario

SCENARIO_NAME = "kitti_pairs"


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
    metrics = evaluator.get_total_step_errors()
    return {
        "Rot. Error Mean [deg]": np.rad2deg(metrics.mean.rotation.chordal),
        "Rot. Error Max [deg]": np.rad2deg(metrics.max.rotation.chordal),
        "Tran. Error Mean [m]": metrics.mean.translation.kitti,
        "Tran. Error Max [m]": metrics.max.translation.kitti,
        "Time [ms]": metrics.mean.time,
    }


def main():
    parser = argparse.ArgumentParser(
        description="Print table for artificial KITTI evaluation."
    )
    parser.add_argument("path", type=str, help="base directory of inference output")
    args = parser.parse_args()

    data = {}
    for dirname in sorted(os.listdir(args.path)):
        directory = osp.join(args.path, dirname)
        if not osp.isdir(directory):
            continue
        scenario = load_scenario_from_dir(directory)
        if scenario is not None and scenario.name == SCENARIO_NAME:
            data[scenario.method.name] = evaluate(directory, scenario)

    if not data:
        warnings.warn("Could not find scenario.")
    else:
        print("== Results on Artificial KITTI Pairs ==")
        print(pd.DataFrame(data).transpose())


if __name__ == "__main__":
    main()
