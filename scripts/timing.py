#!/usr/bin/env python3
"""Inference latency distribution with an untrained model (reference
scripts/timing.py contract: prints per-pair milliseconds, batch 1).

Beyond the reference contract, a second pass re-runs the same predictions
with the padded clouds ALREADY device-resident and reports a compute-only
per-frame time next to the wall time: on relayed / PCIe-attached chips the
host->device upload and per-dispatch overhead dominate single-stream
latency (docs/roofline.md), and the split makes that tax explicit.
``--upload_dtype uint16`` additionally halves the upload itself.
"""
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
from deepclr_tpu.models.base import pad_cloud
from deepclr_tpu.utils.logging import create_logger


def _collect_clouds(cfg, num_points):
    data_loader = make_data_loader(cfg, is_train=False, batch_size=1)
    if data_loader is None:
        raise RuntimeError(
            "config has no data.validation entry — timing needs clouds to "
            "run on (use a config with a data section, e.g. the one written "
            "into a training run directory)"
        )
    pairs = []
    for batch in data_loader:
        template = batch["template"][0][np.asarray(batch["template_mask"][0])]
        source = batch["source"][0][np.asarray(batch["source_mask"][0])]
        pairs.append((np.asarray(template), np.asarray(source)))
    return pairs


def timing(cfg, sequential: bool, upload_dtype: str = "float32") -> None:
    model = build_model(cfg.model)
    num_points = cfg.data_loader.num_points or 16384
    variables = init_params(model, jax.random.PRNGKey(cfg.seed),
                            num_points=num_points)
    helper = ModelInferenceHelper(model, variables, is_sequential=sequential,
                                  num_points=num_points,
                                  upload_dtype=upload_dtype)

    pairs = _collect_clouds(cfg, num_points)

    # pass 1 — the reference contract: wall ms per prediction, printed
    wall_ms = []
    for template, source in pairs:
        t0 = time.perf_counter()
        if sequential:
            if not helper.has_state():
                helper.predict(template)
            y = helper.predict(source)
        else:
            y = helper.predict(source, template)
        np.asarray(y)  # device sync
        ms = (time.perf_counter() - t0) * 1000.0
        wall_ms.append(ms)
        print(ms)

    # pass 2 — compute-only: identical dispatch sequence, inputs already
    # device-resident (pre-padded, pre-uploaded), so the measured time is
    # encode+register+8-float fetch without the upload/pad tax
    import collections

    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def _upload(pair):
        template, source = pair
        pt, mt = pad_cloud(template, num_points, rng)
        ps, ms_ = pad_cloud(source, num_points, rng)
        arrs = tuple(jax.device_put(jnp.asarray(a[None]))
                     for a in (pt, mt, ps, ms_))
        for a in arrs:
            a.block_until_ready()  # transfer done before the timed window
        return arrs

    # stream with a lookahead of one pair — uploading the whole validation
    # set up-front grows device memory linearly (~0.5 MB/pair at 16k pts)
    # and can OOM a small chip on long sequences
    pending = collections.deque([_upload(pairs[0])])
    encode, register, var = helper._encode, helper._register, variables
    step = helper._step  # fused encode+register (sequential path)
    # warm the programs on the resident shapes
    f0 = encode(var, *pending[0][:2])
    if sequential:
        np.asarray(step(var, f0, *pending[0][2:])[0])
    else:
        np.asarray(register(var, f0, f0))

    comp_ms = []
    state = None
    for i in range(len(pairs)):
        if i + 1 < len(pairs):
            pending.append(_upload(pairs[i + 1]))
        pt, mt, ps, ms_ = pending.popleft()
        t0 = time.perf_counter()
        if sequential:
            if state is None:
                state = encode(var, pt, mt)
            # fused single-dispatch frame step (the deployed predict path)
            y, state = step(var, state, ps, ms_)
        else:
            f0 = encode(var, pt, mt)
            f1 = encode(var, ps, ms_)
            y = register(var, f0, f1)
        np.asarray(y)  # device sync (host fetch of 8 floats)
        comp_ms.append((time.perf_counter() - t0) * 1000.0)

    if wall_ms:
        # skip the first wall sample (compile) for the summary
        w = np.asarray(wall_ms[1:] or wall_ms)
        c = np.asarray(comp_ms[1:] or comp_ms)
        print(f"# wall ms/frame: mean {w.mean():.2f} median "
              f"{np.median(w):.2f} (upload_dtype={upload_dtype})")
        print(f"# compute-only ms/frame (device-resident input): mean "
              f"{c.mean():.2f} median {np.median(c):.2f}")
        print(f"# upload+pad+dispatch tax: {w.mean() - c.mean():.2f} ms")


def main():
    parser = argparse.ArgumentParser(
        description="Test inference time with untrained model."
    )
    parser.add_argument("config", type=str, help="training configuration (*.yaml)")
    parser.add_argument("--sequential", action="store_true",
                        help="activate sequential inference")
    parser.add_argument("--upload_dtype", type=str, default="float32",
                        choices=["float32", "uint16"],
                        help="host->device cloud upload format")
    args = parser.parse_args()

    cfg = load_config(args.config, Mode.TEST)
    logger = create_logger(name="timing")
    logger.info("Timing with config loaded")

    timing(cfg, args.sequential, args.upload_dtype)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("Interrupted by user")
