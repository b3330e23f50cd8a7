#!/usr/bin/env python3
"""Evaluation of predicted transformations (reference scripts/evaluation.py
contract: single-run mode writes evaluation/{step,segment}_errors.csv + plot
directories; multi-run mode aggregates all runs of one scenario)."""
import argparse
import os
import os.path as osp
import warnings
from collections import OrderedDict
from typing import Any, List, Optional, Tuple

import numpy as np
import pandas as pd

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.config import Config
from deepclr_tpu.evaluation import Evaluator, MetricsContainer, load_scenario

SAVEFIG_ARGS = {"bbox_inches": "tight", "pad_inches": 0}


def load_scenario_from_dir(directory: str) -> Optional[Config]:
    scenario_file = osp.join(directory, "scenario.yaml")
    if not osp.isfile(scenario_file):
        return None
    try:
        return load_scenario(scenario_file, with_method=True)
    except RuntimeError:
        warnings.warn(f"Scenario invalid: '{scenario_file}'")
        return None


def create_dir(*args: str) -> str:
    directory = osp.join(*args)
    os.makedirs(directory, exist_ok=True)
    return directory


def get_error_dict(name: str, error: MetricsContainer, with_time: bool,
                   method: Optional[str] = None, params: Optional[str] = None,
                   is_normalized: bool = False) -> OrderedDict:
    data: List[Tuple[str, Any]] = [("name", name)]
    if method is not None:
        data.append(("method", method))
    if params is not None:
        data.append(("params", params))

    if is_normalized:
        t_factor, t_unit, r_unit = 100, "%", "deg/m"
    else:
        t_factor, t_unit, r_unit = 1, "m", "deg"

    data.extend([
        (f"t_kitti_mean [{t_unit}]", error.mean.translation.kitti * t_factor),
        (f"t_kitti_std [{t_unit}]", error.std.translation.kitti * t_factor),
        (f"t_kitti_max [{t_unit}]", error.max.translation.kitti * t_factor),
        (f"t_rmse_mean [{t_unit}]", error.mean.translation.rmse * t_factor),
        (f"t_rmse_std [{t_unit}]", error.std.translation.rmse * t_factor),
        (f"t_rmse_max [{t_unit}]", error.max.translation.rmse * t_factor),
        (f"r_kitti_mean [{r_unit}]", np.rad2deg(error.mean.rotation.kitti)),
        (f"r_kitti_std [{r_unit}]", np.rad2deg(error.std.rotation.kitti)),
        (f"r_kitti_max [{r_unit}]", np.rad2deg(error.max.rotation.kitti)),
        (f"r_rmse_mean [{r_unit}]", np.rad2deg(error.mean.rotation.rmse)),
        (f"r_rmse_std [{r_unit}]", np.rad2deg(error.std.rotation.rmse)),
        (f"r_rmse_max [{r_unit}]", np.rad2deg(error.max.rotation.rmse)),
        (f"r_chordal_mean [{r_unit}]", np.rad2deg(error.mean.rotation.chordal)),
        (f"r_chordal_std [{r_unit}]", np.rad2deg(error.std.rotation.chordal)),
        (f"r_chordal_max [{r_unit}]", np.rad2deg(error.max.rotation.chordal)),
    ])
    if with_time:
        data.extend([
            ("time_mean [ms]", error.mean.time),
            ("time_std [ms]", error.std.time),
            ("time_max [ms]", error.max.time),
        ])
    return OrderedDict(data)


def evaluate_single(base_path: str, scenario: Config) -> Evaluator:
    filenames = [f"{k}.txt" for k in scenario.data.keys()]
    evaluator = Evaluator.read(base_path, filenames)
    output_dir = create_dir(base_path, "evaluation")

    step_errors = [
        get_error_dict(name, err, with_time=True, is_normalized=False)
        for name, err in evaluator.get_step_errors().items()
    ]
    step_errors.append(get_error_dict(
        "TOTAL", evaluator.get_total_step_errors(), with_time=True,
        is_normalized=False,
    ))
    pd.DataFrame.from_dict(step_errors).to_csv(
        osp.join(output_dir, "step_errors.csv"), index=False
    )

    if scenario.sequential:
        segment_errors = [
            get_error_dict(name, err, with_time=False, is_normalized=True)
            for name, err in evaluator.get_segment_errors().items()
        ]
        segment_errors.append(get_error_dict(
            "TOTAL", evaluator.get_total_segment_errors(), with_time=False,
            is_normalized=True,
        ))
        pd.DataFrame.from_dict(segment_errors).to_csv(
            osp.join(output_dir, "segment_errors.csv"), index=False
        )

        fig_bars = evaluator.plot_segment_error_bars()
        fig_bars.savefig(osp.join(output_dir, "segment_errors.png"), **SAVEFIG_ARGS)
        fig_bars.savefig(osp.join(output_dir, "segment_errors.pdf"), **SAVEFIG_ARGS)

        eot_dir = create_dir(output_dir, "plot_eot")
        kitti_dir = create_dir(output_dir, "plot_error")
        seq_dir = create_dir(output_dir, "plot_path")
        seq2d_dir = create_dir(output_dir, "plot_path2d")

        for name, fig in evaluator.plot_error_over_time().items():
            fig.savefig(osp.join(eot_dir, f"{name}.png"), **SAVEFIG_ARGS)
            fig.savefig(osp.join(eot_dir, f"{name}.pdf"), **SAVEFIG_ARGS)
        for name, fig in evaluator.plot_kitti_errors().items():
            fig.savefig(osp.join(kitti_dir, f"{name}.png"), **SAVEFIG_ARGS)
            fig.savefig(osp.join(kitti_dir, f"{name}.pdf"), **SAVEFIG_ARGS)
        for name, fig in evaluator.plot_sequences().items():
            fig.savefig(osp.join(seq_dir, f"{name}.png"), **SAVEFIG_ARGS)
            fig.savefig(osp.join(seq_dir, f"{name}.pdf"), **SAVEFIG_ARGS)
        for name, fig in evaluator.plot_sequences_2d().items():
            fig.savefig(osp.join(seq2d_dir, f"{name}.png"), **SAVEFIG_ARGS)
            fig.savefig(osp.join(seq2d_dir, f"{name}.pdf"), **SAVEFIG_ARGS)

    return evaluator


def evaluate_multi(base_path: str, scenario_name: str) -> None:
    step_errors = []
    segment_errors = []
    found = False

    for dirname in sorted(os.listdir(base_path)):
        directory = osp.join(base_path, dirname)
        if not osp.isdir(directory):
            continue
        scenario = load_scenario_from_dir(directory)
        if scenario is None or scenario.name != scenario_name:
            continue
        found = True

        evaluator = evaluate_single(directory, scenario)
        method_params = scenario.method.params.to_dict() \
            if hasattr(scenario.method.params, "to_dict") else {}
        params_str = ", ".join(f"{k}={v}" for k, v in method_params.items())

        step_errors.append(get_error_dict(
            dirname, evaluator.get_total_step_errors(), with_time=True,
            method=scenario.method.name, params=params_str, is_normalized=False,
        ))
        if scenario.sequential:
            segment_errors.append(get_error_dict(
                dirname, evaluator.get_total_segment_errors(), with_time=False,
                method=scenario.method.name, params=params_str,
                is_normalized=True,
            ))

    if not found:
        warnings.warn(f"No evaluation found for scenario '{scenario_name}'")
        return

    out = osp.join(base_path, "evaluation", scenario_name)
    os.makedirs(out, exist_ok=True)
    if step_errors:
        pd.DataFrame.from_dict(step_errors).to_csv(
            osp.join(out, f"{scenario_name}_step_errors.csv"), index=False
        )
    if segment_errors:
        pd.DataFrame.from_dict(segment_errors).to_csv(
            osp.join(out, f"{scenario_name}_segment_errors.csv"), index=False
        )


def main():
    parser = argparse.ArgumentParser(
        description="Run evaluation on predicted transformations."
    )
    parser.add_argument("path", type=str,
                        help="direct or base directory of inference or icp output")
    parser.add_argument("--scenario", type=str, default=None,
                        help="evaluation scenario")
    args = parser.parse_args()

    if args.scenario is None:
        scenario = load_scenario_from_dir(args.path)
        if scenario is not None:
            evaluate_single(args.path, scenario)
    else:
        evaluate_multi(args.path, args.scenario)


if __name__ == "__main__":
    main()
