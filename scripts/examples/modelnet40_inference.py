#!/usr/bin/env python3
"""Minimal pairwise-inference demo on raw ModelNet40 data
(reference scripts/examples/modelnet40_inference.py)."""
import argparse
import os
import os.path as osp

import jax
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import load_model_config
from deepclr_tpu.data.transforms import (
    ApplyAugmentations,
    Compose,
    FarthestPointSampling,
    NoiseType,
    RandomTransform,
)
from deepclr_tpu.geometry.hostmath import label_to_matrix_np
from deepclr_tpu.models import (
    ModelInferenceHelper,
    build_model,
    init_params,
    load_weights,
)


def main():
    parser = argparse.ArgumentParser(
        description="Model inference for ModelNet40 data."
    )
    parser.add_argument("model_name", type=str,
                        help="Model name (directory in MODEL_PATH)")
    parser.add_argument("--num_samples", type=int, default=5)
    args = parser.parse_args()

    modelnet40_path = os.getenv("MODELNET40_PATH")
    if modelnet40_path is None:
        raise RuntimeError(
            "Could not get ModelNet40 path from environment variable MODELNET40_PATH."
        )
    directory = osp.join(modelnet40_path, "original")
    listfile = osp.join(directory, "modelnet40_test.txt")

    model_path = os.getenv("MODEL_PATH")
    if model_path is None:
        raise RuntimeError(
            "Could not get model path from environment variable MODEL_PATH."
        )
    cfg_file = osp.join(model_path, args.model_name, "model_config.yaml")
    weights_file = osp.join(model_path, args.model_name, "weights.msgpack")

    model_cfg = load_model_config(cfg_file, weights_file)
    model = build_model(model_cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=2048)
    variables = load_weights(weights_file, variables)
    helper = ModelInferenceHelper(model, variables, is_sequential=False,
                                  num_points=2048)

    names = [line.rstrip("\n") for line in open(listfile)]
    files = [
        osp.join(directory, n.rpartition("_")[0], f"{n}.txt") for n in names
    ]

    transform = Compose([
        FarthestPointSampling(2048),
        RandomTransform(0.1, 5.0,
                        translation_noise_type=NoiseType.UNIFORM,
                        rotation_noise_deg_type=NoiseType.UNIFORM),
        ApplyAugmentations(),
    ])

    for f in files[: args.num_samples]:
        cloud = np.loadtxt(f, delimiter=",")[:, :3].astype(np.float32)
        sample = {
            "dataset": "demo",
            "idx": [0, 0],
            "timestamps": [0.0, 0.0],
            "clouds": [cloud, cloud.copy()],
            "transform": np.eye(4),
            "augmentations": [None, None],
        }
        sample = transform(sample)

        y_pred = helper.predict(sample["clouds"][1], sample["clouds"][0])
        m_pred = label_to_matrix_np(model_cfg.label_type, y_pred)
        m_gt = sample["transform"]
        t_err = np.linalg.norm(m_pred[:3, 3] - m_gt[:3, 3])
        print(f"{osp.basename(f)}: translation error {t_err:.4f} m")
        print(m_pred)


if __name__ == "__main__":
    main()
