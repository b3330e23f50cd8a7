#!/usr/bin/env python
"""Multi-stream sequential-odometry throughput on real TPU.

Single-stream sequential latency (`timing.py --sequential`) is dominated by
per-dispatch relay overhead (~48-54 ms/frame at 16k pts, docs/roofline.md).
Production replay — evaluating a whole scenario, offline mapping — runs many
sequences at once; `BatchedSequentialHelper` advances B streams per dispatch,
amortizing that overhead and running encode/register at batched throughput.
Each frame costs ONE encode + one register (the pairwise path costs two
encodes), so frames/s here can exceed bench.py's pairs/s.

Usage: python scripts/bench_sequential_batch.py [--batch 16] [--n 16384]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __graft_entry__ import KITTI_MODEL_CFG  # noqa: E402


def _frame(rng, n):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts *= np.array([30.0, 30.0, 2.0], np.float32)
    extra = rng.uniform(0.0, 1.0, size=(n, 1)).astype(np.float32)
    return np.concatenate([pts, extra], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="concurrent sequences")
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--frames", type=int, default=20,
                    help="timed frames per stream")
    ap.add_argument("--upload_dtype", type=str, default="float32",
                    choices=["float32", "uint16"],
                    help="host->device cloud upload format (uint16 halves "
                         "the per-step transfer)")
    args = ap.parse_args()

    import jax

    from deepclr_tpu.models import (
        BatchedSequentialHelper, build_model, init_params,
    )

    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0),
                            num_points=args.n, batch_size=args.batch)
    helper = BatchedSequentialHelper(model, variables, batch=args.batch,
                                     num_points=args.n,
                                     upload_dtype=args.upload_dtype)

    rng = np.random.default_rng(0)
    frames = [[_frame(rng, args.n) for _ in range(args.batch)]
              for _ in range(args.frames + 3)]

    for t in range(3):  # compile + warm both programs + seed state
        helper.step(frames[t])

    t0 = time.perf_counter()
    for t in range(3, 3 + args.frames):
        out = helper.step(frames[t])
    assert out[0] is not None and np.isfinite(out[0]).all()
    dt = time.perf_counter() - t0

    fps = args.batch * args.frames / dt
    print(f"batched sequential odometry: B={args.batch} streams x "
          f"{args.n} pts")
    print(f"  {fps:.1f} frames/s total ({dt / args.frames * 1e3:.2f} ms/step,"
          f" {dt / args.frames / args.batch * 1e3:.3f} ms/frame)")
    print(f"  per-stream rate: {args.frames / dt:.1f} frames/s "
          f"(single-stream baseline ~20 frames/s, docs/roofline.md)")


if __name__ == "__main__":
    main()
