#!/usr/bin/env python
"""Training-step profiler for the flagship KITTI model on real TPU.

Breaks the fwd+bwd cost into: forward, value_and_grad of the full loss,
the fused-SA argmax (backward) kernel alone, and the complete jitted train
step (grads + accumulation + Ranger + EMAs).  Honest host-fetch sync
(scalar reduction inside jit; see .claude/skills/verify/SKILL.md).

Usage: python scripts/profile_train.py [--batch 8] [--n 16384]
"""
import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __graft_entry__ import KITTI_MODEL_CFG  # noqa: E402


def _kitti_like_clouds(batch, n, d, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(batch, n, 3)).astype(np.float32)
    pts *= np.array([30.0, 30.0, 2.0], np.float32)
    extra = rng.uniform(0.0, 1.0, size=(batch, n, d - 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([pts, extra], axis=-1))


def timeit(jfn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.tree_util.tree_map(np.asarray, jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jfn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from deepclr_tpu.engine import create_train_state, make_train_step
    from deepclr_tpu.geometry import LabelType
    from deepclr_tpu.losses import make_loss_fn, make_metric_fns
    from deepclr_tpu.models import build_model, init_params
    from deepclr_tpu.solver.optimizers import ranger

    b, n = args.batch, args.n
    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=n,
                            batch_size=b)

    template = _kitti_like_clouds(b, n, 4, seed=1)
    source = _kitti_like_clouds(b, n, 4, seed=2)
    motion = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    motion[:, 0, 3] = 0.5
    y = jnp.asarray(LabelType.POSE3D_DUAL_QUAT.from_matrix(motion),
                    jnp.float32)

    loss_cfg = [
        {"type": "trans", "weights": [1.0], "params": {"p": 2}},
        {"type": "rot", "weights": [200.0], "params": {"p": 2}},
    ]
    loss_fn = make_loss_fn(loss_cfg, LabelType.POSE3D_DUAL_QUAT)
    metric_fns = make_metric_fns(loss_cfg, [], LabelType.POSE3D_DUAL_QUAT)

    results = {}

    # forward only
    def fwd(params, template, source):
        y_pred, _ = model.apply({"params": params}, template, source)
        return jnp.sum(loss_fn(y_pred, y))

    results["forward"] = timeit(jax.jit(fwd), variables["params"],
                                template, source, iters=args.iters)

    # value_and_grad of the loss (no optimizer).  Reduce the grads to ONE
    # scalar output: returning a pytree of per-leaf sums (~200 buffers)
    # costs ~95 ms of pure per-output dispatch overhead through this
    # container's relayed TPU client and masks the real kernel time.
    vg = jax.jit(lambda p, t, s: sum(
        jnp.sum(g) for g in
        jax.tree_util.tree_leaves(jax.value_and_grad(fwd)(p, t, s)[1])))
    results["fwd+bwd (grads)"] = timeit(vg, variables["params"],
                                        template, source, iters=args.iters)

    # full train step (grads + accumulation + Ranger + EMAs), donated
    optimizer = ranger(learning_rate=5e-4, weight_decay=1e-3)
    train_step = make_train_step(model, optimizer, loss_fn, metric_fns,
                                 accumulation_steps=2)
    batch_dict = {
        "template": template, "source": source,
        "template_mask": jnp.ones((b, n), bool),
        "source_mask": jnp.ones((b, n), bool),
        "y": y,
    }

    def step_time():
        state = create_train_state(
            model, variables, optimizer,
            metric_names=["loss", "loss_fn", *metric_fns.keys()])
        # warmup (compiles; state donated -> recreate)
        for _ in range(2):
            state, m = train_step(state, batch_dict, np.float32(5e-4))
            np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = train_step(state, batch_dict, np.float32(5e-4))
        np.asarray(m["loss"])
        return (time.perf_counter() - t0) / args.iters * 1e3

    results["train_step (full)"] = step_time()

    print(f"\n=== train profile (batch={b}, n={n}, "
          f"backend={jax.default_backend()}) ===")
    for k, v in results.items():
        print(f"{k:>20}: {v:8.2f} ms  ({b / (v / 1e3):6.1f} pairs/s)")


if __name__ == "__main__":
    main()
