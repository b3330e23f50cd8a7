#!/usr/bin/env python3
"""ICP registration for an evaluation scenario (reference scripts/icp.py
contract: same output layout as inference.py)."""
import argparse
import os
import os.path as osp
import time
from datetime import datetime

import numpy as np
import yaml

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.data import create_input_dataflow
from deepclr_tpu.evaluation import Evaluator, load_scenario
from deepclr_tpu.icp import ICPAlgorithm, ICPRegistration
from deepclr_tpu.utils.logging import create_logger


def main():
    parser = argparse.ArgumentParser(
        description="ICP registration for evaluation scenario."
    )
    parser.add_argument("scenario", type=str, help="scenario configuration (*.yaml)")
    parser.add_argument("algorithm", type=str,
                        choices=[a.value for a in ICPAlgorithm],
                        help="ICP algorithm type")
    parser.add_argument("output_base", type=str,
                        help="base directory for inference output")
    parser.add_argument("--max-distance", type=float, default=1.0,
                        help="maximal distance for ICP (default: 1.0)")
    parser.add_argument("--neighbor-radius", type=float, default=1.0,
                        help="neighbor radius (e.g. for ICP plane) (default: 1.0)")
    parser.add_argument("--max-nn", type=int, default=30,
                        help="maximal number of neighbors (default: 30)")
    parser.add_argument("--max-iterations", type=int, default=100,
                        help="ICP outer iteration cap (default: 100)")
    parser.add_argument("--epsilon", type=float, default=1e-3,
                        help="convergence threshold on the transform "
                             "update (default: 1e-3)")
    args = parser.parse_args()

    logger = create_logger("evaluation")

    logger.info("Loading scenario")
    scene_cfg = load_scenario(args.scenario, with_method=False)
    algorithm = ICPAlgorithm.create(args.algorithm)

    registration = ICPRegistration(
        algorithm, max_distance=args.max_distance,
        neighbor_radius=args.neighbor_radius, max_nn=args.max_nn,
        max_iterations=args.max_iterations, epsilon=args.epsilon,
    )
    evaluator = Evaluator()

    output_stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    output_dir = osp.join(
        args.output_base, f"{output_stamp}_{scene_cfg.name}_{algorithm.name}"
    )
    os.makedirs(output_dir, exist_ok=True)

    eval_cfg = scene_cfg.to_dict()
    eval_cfg["method"] = {
        "name": algorithm.name,
        "params": {
            "max_distance": args.max_distance,
            "neighbor_radius": args.neighbor_radius,
            "max_nn": args.max_nn,
            "max_iterations": args.max_iterations,
            "epsilon": args.epsilon,
        },
    }
    with open(osp.join(output_dir, "scenario.yaml"), "w") as f:
        yaml.dump(eval_cfg, f, default_flow_style=False, sort_keys=False)

    for data_name, data_file in scene_cfg.data.items():
        logger.info(f"Evaluate '{data_file}'")
        df = create_input_dataflow(scene_cfg.dataset_type, data_file, shuffle=False)

        prev_prepared = None
        for i, ds in enumerate(df):
            if (i + 1) % 10 == 0:
                logger.info(f"Data point {i + 1}/{len(df)}")

            stamp = ds["timestamps"][0]
            transform_gt = ds["transform"]

            t0 = time.perf_counter()
            if scene_cfg.sequential and prev_prepared is not None:
                template = prev_prepared
            else:
                template = registration.prepare(ds["clouds"][0][:, :3])
            source = registration.prepare(ds["clouds"][1][:, :3])
            m = registration.register(template, source)
            t_pred_ms = (time.perf_counter() - t0) * 1000.0
            prev_prepared = source

            evaluator.add_transforms(
                str(data_name), float(np.ravel(stamp)[0]), m,
                transform_gt, t_pred_ms,
            )

    logger.info("Store results")
    evaluator.write(output_dir)


if __name__ == "__main__":
    main()
