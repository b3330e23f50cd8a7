#!/usr/bin/env python3
"""Convert a reference (PyTorch) DeepCLR checkpoint into this framework's
weights.msgpack format.

Usage: convert_torch_weights.py WEIGHTS.tar MODEL_CONFIG.yaml OUT.msgpack
"""
import argparse

import jax
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.config import load_model_config
from deepclr_tpu.models import build_model, init_params, save_weights
from deepclr_tpu.models.torch_convert import load_torch_checkpoint


def main():
    parser = argparse.ArgumentParser(
        description="Convert torch DeepCLR weights to flax msgpack."
    )
    parser.add_argument("weights", type=str, help="torch weights.tar")
    parser.add_argument("model_config", type=str, help="model_config.yaml")
    parser.add_argument("output", type=str, help="output weights.msgpack")
    args = parser.parse_args()

    model_cfg = load_model_config(args.model_config, args.weights)
    model = build_model(model_cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=1024)

    converted = load_torch_checkpoint(args.weights)

    # validate structure against the freshly initialized tree
    def merge(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"Unexpected converted param '{path}/{k}'")
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}/{k}")
            else:
                if np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"Shape mismatch at {path}/{k}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}"
                    )
                dst[k] = np.asarray(v, np.float32)

    params = jax.device_get(variables["params"])
    merge(params, converted)
    save_weights(args.output, {"params": params})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
