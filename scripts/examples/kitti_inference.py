#!/usr/bin/env python3
"""Minimal sequential-inference demo on raw KITTI odometry data
(reference scripts/examples/kitti_inference.py)."""
import argparse
import os
import os.path as osp

import jax
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import load_model_config
from deepclr_tpu.data.readers import KittiOdometryVelodyneData
from deepclr_tpu.geometry.hostmath import label_to_matrix_np
from deepclr_tpu.models import (
    ModelInferenceHelper,
    build_model,
    init_params,
    load_weights,
)


def main():
    parser = argparse.ArgumentParser(
        description="Sequential model inference for raw KITTI data."
    )
    parser.add_argument("model_name", type=str,
                        help="Model name (directory in MODEL_PATH)")
    parser.add_argument("--sequence", type=str, default="04")
    parser.add_argument("--num_frames", type=int, default=10)
    args = parser.parse_args()

    kitti_path = os.getenv("KITTI_PATH")
    if kitti_path is None:
        raise RuntimeError(
            "Could not get KITTI path from environment variable KITTI_PATH."
        )
    model_path = os.getenv("MODEL_PATH")
    if model_path is None:
        raise RuntimeError(
            "Could not get model path from environment variable MODEL_PATH."
        )

    cfg_file = osp.join(model_path, args.model_name, "model_config.yaml")
    weights_file = osp.join(model_path, args.model_name, "weights.msgpack")

    model_cfg = load_model_config(cfg_file, weights_file)
    model = build_model(model_cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=16384)
    variables = load_weights(weights_file, variables)
    helper = ModelInferenceHelper(model, variables, is_sequential=True,
                                  num_points=16384)

    df = KittiOdometryVelodyneData(
        osp.join(kitti_path, "original"), args.sequence, shuffle=False
    )

    prev = None
    for i, frame in enumerate(df):
        if i >= args.num_frames:
            break
        cloud = frame["cloud"][::2]  # every 2nd point, like the converter
        y_pred = helper.predict(cloud)
        if y_pred is None:
            prev = frame
            continue
        m_pred = label_to_matrix_np(model_cfg.label_type, y_pred)
        if prev is not None:
            m_gt = np.linalg.inv(prev["pose"]) @ frame["pose"]
            t_err = np.linalg.norm(m_pred[:3, 3] - m_gt[:3, 3])
            print(f"frame {i}: translation error {t_err:.4f} m")
        prev = frame


if __name__ == "__main__":
    main()
