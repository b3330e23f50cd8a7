#!/usr/bin/env python3
"""Model inference for an evaluation scenario.

CLI parity with reference scripts/inference.py: loads model_config.yaml +
weights from $MODEL_PATH/MODEL_NAME, runs sequential or pairwise inference
over each scenario data file, times every prediction, and writes per-sequence
txt files (26-column format) + scenario.yaml into
OUTPUT_BASE/{stamp}_{scenario}_{model_type}/.
"""
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

from deepclr_tpu.config import load_model_config
from deepclr_tpu.data import create_input_dataflow
from deepclr_tpu.evaluation import Evaluator, load_scenario
from deepclr_tpu.geometry.hostmath import label_to_matrix_np
from deepclr_tpu.models import (
    BatchedSequentialHelper,
    ModelInferenceHelper,
    build_model,
    init_params,
    load_weights,
)
from deepclr_tpu.utils.logging import create_logger

DEFAULT_NUM_POINTS = 16384


def _run_parallel_sequences(scene_cfg, model, variables, num_points,
                            evaluator, label_type, logger, max_streams,
                            upload_dtype="float32"):
    """Sequential inference with up to ``max_streams`` sequences advancing
    lock-step through one BatchedSequentialHelper (one encode + one register
    dispatch per frame for ALL lanes — amortizes per-dispatch overhead ~B
    ways, docs/roofline.md).  Predictions are identical to the stream-at-a-
    time path when clouds fit ``num_points`` without subsampling; the
    recorded per-frame time is the step time divided by the active lanes
    (the amortized cost of that prediction)."""
    items = list(scene_cfg.data.items())
    # one helper per distinct lane count: every full group shares the same
    # b_dim, so the jitted encode/register programs compile once and only a
    # final short group triggers a second compile
    helpers: dict = {}
    for g0 in range(0, len(items), max_streams):
        group = items[g0:g0 + max_streams]
        iters = []
        current = []  # pair whose source is next, per lane
        kept = []
        for name, data_file in group:
            it = iter(create_input_dataflow(scene_cfg.dataset_type, data_file,
                                            shuffle=False))
            try:
                first = next(it)
            except StopIteration:
                logger.warning(f"'{data_file}' yields no pairs; skipping")
                continue
            iters.append(it)
            current.append(first)
            kept.append((name, data_file))
        group = kept
        b_dim = len(group)
        if b_dim == 0:
            continue
        logger.info("Evaluate " +
                    ", ".join(f"'{f}'" for _, f in group) +
                    f" ({b_dim} parallel streams)")
        if b_dim not in helpers:
            helpers[b_dim] = BatchedSequentialHelper(
                model, variables, batch=b_dim, num_points=num_points,
                upload_dtype=upload_dtype)
        helper = helpers[b_dim]
        helper.reset_all()

        clouds = [np.asarray(ds["clouds"][0]) for ds in current]
        helper.step(clouds)  # seed every lane's state with its template
        # warm the fused step program outside the timed loop (re-encoding
        # the template against itself; identical state when clouds fit
        # num_points — with subsampling it just re-draws the template
        # subsample).  Cold compiles otherwise charge minutes to the
        # first frame's recorded time.
        helper.step(clouds)
        active = [True] * b_dim
        step = 0
        while any(active):
            for b in range(b_dim):
                if active[b]:
                    # finished lanes keep their previous cloud: the lane
                    # still computes, but nothing is recorded for it
                    clouds[b] = np.asarray(current[b]["clouds"][1])
            t0 = time.perf_counter()
            preds = helper.step(clouds)
            t_share_ms = ((time.perf_counter() - t0) * 1000.0
                          / max(1, sum(active)))
            for b in range(b_dim):
                if not active[b]:
                    continue
                ds = current[b]
                transform_pred = label_to_matrix_np(
                    label_type, np.asarray(preds[b]))
                evaluator.add_transforms(
                    str(group[b][0]), float(np.ravel(ds["timestamps"][0])[0]),
                    transform_pred, ds["transform"], t_share_ms,
                )
                try:
                    current[b] = next(iters[b])
                except StopIteration:
                    active[b] = False
            step += 1
            if step % 10 == 0:
                logger.info(f"Step {step} ({sum(active)}/{b_dim} streams active)")


def _run_batched_pairwise(scene_cfg, helper, evaluator, label_type, logger,
                          batch):
    """Pairwise inference through ModelInferenceHelper.predict_batch: B
    independent pairs per dispatch.  The tail chunk is padded by repeating
    its last pair (keeps the compiled shape; extras discarded).  Recorded
    per-pair time is the dispatch time divided by the real pairs in it."""
    warmed = False
    for data_name, data_file in scene_cfg.data.items():
        logger.info(f"Evaluate '{data_file}' (batched pairwise, B={batch})")
        df = create_input_dataflow(scene_cfg.dataset_type, data_file,
                                   shuffle=False)
        pending = []
        it = iter(df)
        done = False
        n_done = 0
        while not done:
            try:
                pending.append(next(it))
            except StopIteration:
                done = True
            if (len(pending) == batch or (done and pending)):
                real = len(pending)
                chunk = pending + [pending[-1]] * (batch - real)
                pending = []
                templates = [np.asarray(ds["clouds"][0]) for ds in chunk]
                sources = [np.asarray(ds["clouds"][1]) for ds in chunk]
                if not warmed:
                    # pay the jit compiles OUTSIDE the timed window, like
                    # the reference's CUDA warmup — otherwise the first
                    # batch charges minutes of cold compile to its pairs
                    # and the table's mean time is junk
                    np.asarray(helper.predict_batch(sources, templates))
                    warmed = True
                t0 = time.perf_counter()
                preds = helper.predict_batch(sources, templates)
                t_share_ms = (time.perf_counter() - t0) * 1000.0 / real
                for b in range(real):
                    ds = chunk[b]
                    transform_pred = label_to_matrix_np(
                        label_type, np.asarray(preds[b]))
                    evaluator.add_transforms(
                        str(data_name),
                        float(np.ravel(ds["timestamps"][0])[0]),
                        transform_pred, ds["transform"], t_share_ms,
                    )
                n_done += real
                if (n_done // batch) % 10 == 0:
                    logger.info(f"Data point {n_done}/{len(df)}")


def main():
    parser = argparse.ArgumentParser(
        description="Model inference for evaluation scenario."
    )
    parser.add_argument("scenario", type=str, help="scenario configuration (*.yaml)")
    parser.add_argument("model_name", type=str,
                        help="model name (subdirectory of MODEL_PATH)")
    parser.add_argument("output_base", type=str,
                        help="base directory for inference output")
    parser.add_argument("--model_path", type=str, default=None,
                        help="alternative model path instead of MODEL_PATH")
    parser.add_argument("--weights", type=str, default="weights.msgpack",
                        help="model weights (default: weights.msgpack)")
    parser.add_argument("--num_points", type=int, default=DEFAULT_NUM_POINTS,
                        help="fixed padded cloud size for the compiled model")
    parser.add_argument("--upload_dtype", type=str, default="float32",
                        choices=["float32", "uint16"],
                        help="host->device cloud upload format; uint16 "
                             "fixed-point halves the transfer (~3 mm "
                             "resolution over +/-100 m)")
    parser.add_argument("--parallel_sequences", type=int, default=1,
                        help="batch N lanes per device dispatch: sequential "
                             "scenarios advance N sequences lock-step, "
                             "pairwise scenarios predict N pairs per call "
                             "(~6x total throughput at N=16)")
    args = parser.parse_args()

    logger = create_logger("evaluation")

    logger.info("Loading scenario")
    scene_cfg = load_scenario(args.scenario, with_method=False)

    model_base_path = args.model_path or os.getenv("MODEL_PATH")
    if model_base_path is None:
        raise RuntimeError(
            "Could not get model path from environment variable MODEL_PATH or argument."
        )
    model_path = osp.join(model_base_path, args.model_name)
    model_file = osp.join(model_path, "model_config.yaml")
    weights_file = osp.join(model_path, args.weights)

    logger.info("Read model configuration")
    model_cfg = load_model_config(model_file, weights_file)

    logger.info("Load model")
    import jax

    model = build_model(model_cfg)
    variables = init_params(model, jax.random.PRNGKey(0),
                            num_points=args.num_points)
    variables = load_weights(weights_file, variables)

    helper = ModelInferenceHelper(
        model, variables, is_sequential=scene_cfg.sequential,
        num_points=args.num_points, upload_dtype=args.upload_dtype,
    )
    evaluator = Evaluator()

    output_stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    output_dir = osp.join(
        args.output_base,
        f"{output_stamp}_{scene_cfg.name}_{model_cfg.model_type.name}",
    )
    logger.info("Create output directory")
    os.makedirs(output_dir, exist_ok=True)

    # store evaluation scenario (method entries filled in)
    eval_cfg = scene_cfg.to_dict()
    eval_cfg["method"] = {
        "name": model_cfg.model_type.name,
        "params": {
            "model_name": args.model_name,
            "model_file": model_file,
            "weights_file": weights_file,
        },
    }
    with open(osp.join(output_dir, "scenario.yaml"), "w") as f:
        yaml.dump(eval_cfg, f, default_flow_style=False, sort_keys=False)

    label_type = model_cfg.label_type

    if scene_cfg.sequential and args.parallel_sequences > 1:
        _run_parallel_sequences(
            scene_cfg, model, variables, args.num_points, evaluator,
            label_type, logger, args.parallel_sequences,
            upload_dtype=args.upload_dtype,
        )
        logger.info("Store results")
        evaluator.write(output_dir)
        return
    if not scene_cfg.sequential and args.parallel_sequences > 1:
        _run_batched_pairwise(
            scene_cfg, helper, evaluator, label_type, logger,
            args.parallel_sequences,
        )
        logger.info("Store results")
        evaluator.write(output_dir)
        return

    for data_name, data_file in scene_cfg.data.items():
        logger.info(f"Evaluate '{data_file}'")
        df = create_input_dataflow(scene_cfg.dataset_type, data_file, shuffle=False)
        helper.reset_state()

        for i, ds in enumerate(df):
            if (i + 1) % 10 == 0:
                logger.info(f"Data point {i + 1}/{len(df)}")

            template = ds["clouds"][0]
            source = ds["clouds"][1]
            stamp = ds["timestamps"][0]
            transform_gt = ds["transform"]

            t0 = time.perf_counter()
            if scene_cfg.sequential:
                if not helper.has_state():
                    helper.predict(template)
                y_pred = helper.predict(source)
            else:
                y_pred = helper.predict(source, template)
            y_pred = np.asarray(y_pred)  # forces device sync
            t_pred_ms = (time.perf_counter() - t0) * 1000.0

            transform_pred = label_to_matrix_np(label_type, y_pred)
            evaluator.add_transforms(
                str(data_name), float(np.ravel(stamp)[0]),
                transform_pred, transform_gt, t_pred_ms,
            )

    logger.info("Store results")
    evaluator.write(output_dir)


if __name__ == "__main__":
    main()
