#!/usr/bin/env python3
"""Inference latency distribution with an untrained model (reference
scripts/timing.py contract: prints per-pair milliseconds, batch 1)."""
import argparse
import time

import jax
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.config import Mode, load_config
from deepclr_tpu.data import make_data_loader
from deepclr_tpu.models import ModelInferenceHelper, build_model, init_params
from deepclr_tpu.utils.logging import create_logger


def timing(cfg, sequential: bool) -> None:
    model = build_model(cfg.model)
    num_points = cfg.data_loader.num_points or 16384
    variables = init_params(model, jax.random.PRNGKey(cfg.seed),
                            num_points=num_points)
    helper = ModelInferenceHelper(model, variables, is_sequential=sequential,
                                  num_points=num_points)

    data_loader = make_data_loader(cfg, is_train=False, batch_size=1)
    if data_loader is None:
        raise RuntimeError(
            "config has no data.validation entry — timing needs clouds to "
            "run on (use a config with a data section, e.g. the one written "
            "into a training run directory)"
        )

    for batch in data_loader:
        template = batch["template"][0][batch["template_mask"][0]]
        source = batch["source"][0][batch["source_mask"][0]]

        t0 = time.perf_counter()
        if sequential:
            if not helper.has_state():
                helper.predict(template)
            y = helper.predict(source)
        else:
            y = helper.predict(source, template)
        np.asarray(y)  # device sync
        print((time.perf_counter() - t0) * 1000.0)


def main():
    parser = argparse.ArgumentParser(
        description="Test inference time with untrained model."
    )
    parser.add_argument("config", type=str, help="training configuration (*.yaml)")
    parser.add_argument("--sequential", action="store_true",
                        help="activate sequential inference")
    args = parser.parse_args()

    cfg = load_config(args.config, Mode.TEST)
    logger = create_logger(name="timing")
    logger.info("Timing with config loaded")

    timing(cfg, args.sequential)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("Interrupted by user")
