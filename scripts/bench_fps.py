#!/usr/bin/env python
"""FPS kernel floor analysis on real TPU.

The v4 kernel's cost model is npoint sequential iterations of ~15
plane-wide (B, N) VPU ops (ops/pallas/fps_kernel.py).  This bench
measures wall ms across npoint and N to separate the per-iteration loop
cost (linear in npoint) from fixed overhead, giving the roofline for
VERDICT-style "is the sequential-argmax chain at its floor" questions.

Usage: python scripts/bench_fps.py [--batch 16] [--n 16384]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepclr_tpu.ops.fps import furthest_point_sample

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(
        rng.normal(size=(args.batch, args.n, 3)).astype(np.float32) * 30.0
    )
    mask = jnp.ones((args.batch, args.n), bool)

    def timed(npoint, n=None):
        x = xyz if n is None else xyz[:, :n]
        m = mask if n is None else mask[:, :n]

        @jax.jit
        def fn(x, m):
            idx = furthest_point_sample(x, npoint, mask=m)
            return jnp.sum(idx)

        np.asarray(fn(x, m))  # compile
        np.asarray(fn(x, m))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(x, m)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    print(f"B={args.batch}, N={args.n}: npoint scaling (loop cost)")
    base = None
    for npoint in (256, 512, 1024, 2048):
        ms = timed(npoint)
        if base is None:
            base = (npoint, ms)
        print(f"  npoint={npoint:5d}: {ms:7.2f} ms "
              f"({ms / npoint * 1e3:.2f} us/iteration)")
    n0, m0 = base
    # linear model from the 256 -> 2048 span: ms = fixed + slope*npoint
    m1 = timed(2048)
    slope = (m1 - m0) / (2048 - n0)
    print(f"  linear fit: fixed {m0 - slope * n0:.2f} ms + "
          f"{slope * 1e3:.2f} us/iteration")

    print(f"npoint=1024: N scaling (plane-width cost)")
    for n in (4096, 8192, 16384):
        ms = timed(1024, n=n)
        print(f"  N={n:6d}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
