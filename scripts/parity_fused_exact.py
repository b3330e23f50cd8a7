#!/usr/bin/env python
"""Quantify the fused-SA semantic deviation against exact reference
semantics, end-to-end through the pose head.

The fused set-abstraction path pools over ALL in-radius points; the
reference truncates each ball to its first ``nsample`` hits in index order
and pads by duplicating the first hit (reference
extern/pointnet2.patch:101-116, upstream ball_query_gpu.cu).  The paths
are identical whenever every ball holds <= nsample hits, so the deviation
only shows on dense neighborhoods — this script measures it on synthetic
KITTI-density LiDAR pairs (data/synthetic.py) with weights quick-trained
to a non-degenerate operating point:

  1. train the fused bf16 model for --train-steps on synthetic pairs,
  2. run fused (f32) vs exact (f32) with the SAME weights on held-out
     pairs; report pose-output drift, decoded translation/rotation drift,
     and each path's error against ground truth,
  3. also report bf16-fused vs f32-fused drift (compute-dtype effect).

Usage: python scripts/parity_fused_exact.py [--train-steps 300]
       [--pairs 16] [--num-points 16384] [--json out.json]
"""
import argparse
import copy
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __graft_entry__ import KITTI_MODEL_CFG  # noqa: E402
from deepclr_tpu.data.synthetic import lidar_pair  # noqa: E402
from deepclr_tpu.geometry import LabelType, hostmath  # noqa: E402
from deepclr_tpu.losses import make_loss_fn  # noqa: E402
from deepclr_tpu.models import build_model, init_params  # noqa: E402
from deepclr_tpu.solver import make_optimizer  # noqa: E402

LABEL = LabelType.POSE3D_DUAL_QUAT


def gen_batch(rng, batch, n):
    ts, ss, ys = [], [], []
    for _ in range(batch):
        t, s, m = lidar_pair(rng, n)
        ts.append(t)
        ss.append(s)
        ys.append(hostmath.label_from_matrix_np(LABEL, m))
    return (np.stack(ts), np.stack(ss),
            np.stack(ys).astype(np.float32))


def rot_err_deg(m1, m2):
    r = m1[:3, :3] @ m2[:3, :3].T
    c = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(c))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--num-points", type=int, default=16384)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    n = args.num_points
    rng = np.random.default_rng(0)

    # --- models: one parameter pytree, three execution paths -------------
    cfg_bf16 = copy.deepcopy(KITTI_MODEL_CFG)
    cfg_f32 = copy.deepcopy(KITTI_MODEL_CFG)
    cfg_f32["params"]["compute_dtype"] = "float32"
    cfg_exact = copy.deepcopy(cfg_f32)
    cfg_exact["params"]["fused"] = False

    model_bf16 = build_model(cfg_bf16)
    model_f32 = build_model(cfg_f32)
    model_exact = build_model(cfg_exact)

    variables = init_params(model_bf16, jax.random.PRNGKey(0),
                            num_points=n, batch_size=args.batch)

    # --- quick training on synthetic pairs (fused bf16 path) -------------
    loss_fn = make_loss_fn(
        [{"type": "trans", "weights": [1.0], "params": {"p": 2}},
         {"type": "rot", "weights": [200.0], "params": {"p": 2}}],
        LABEL,
    )
    optimizer = make_optimizer(type("C", (), {
        "optimizer": type("O", (), {
            "name": "Ranger", "base_lr": 5e-4, "weight_decay": 0.0,
            "params": {},
        })(),
    })())
    opt_state = optimizer.init(variables["params"])

    @jax.jit
    def train_step(params, opt_state, template, source, y):
        def loss_of(p):
            y_pred, _ = model_bf16.apply({"params": p}, template, source)
            return loss_fn(y_pred, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        return params, opt_state, loss

    # pre-generated batch pool: host raycasting would otherwise dominate
    # the training loop (~0.6 s per fresh 8-pair batch)
    pool = [gen_batch(rng, args.batch, n) for _ in range(10)]

    params = variables["params"]
    t0 = time.perf_counter()
    for step in range(args.train_steps):
        template, source, y = pool[step % len(pool)]
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(template), jnp.asarray(source),
            jnp.asarray(y),
        )
        if step % 50 == 0 or step == args.train_steps - 1:
            print(f"step {step:4d}: loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    variables = {"params": params}

    # --- parity evaluation -----------------------------------------------
    fwd_bf16 = jax.jit(lambda v, t, s: model_bf16.apply(v, t, s)[0])
    fwd_f32 = jax.jit(lambda v, t, s: model_f32.apply(v, t, s)[0])
    fwd_exact = jax.jit(lambda v, t, s: model_exact.apply(v, t, s)[0])

    eval_rng = np.random.default_rng(1234)
    rows = []
    for i in range(0, args.pairs, args.batch):
        b = min(args.batch, args.pairs - i)
        template, source, y = gen_batch(eval_rng, b, n)
        t, s = jnp.asarray(template), jnp.asarray(source)
        y_b = np.asarray(fwd_bf16(variables, t, s))
        y_f = np.asarray(fwd_f32(variables, t, s))
        y_e = np.asarray(fwd_exact(variables, t, s))
        for j in range(b):
            m_f = hostmath.label_to_matrix_np(LABEL, y_f[j])
            m_e = hostmath.label_to_matrix_np(LABEL, y_e[j])
            m_b = hostmath.label_to_matrix_np(LABEL, y_b[j])
            m_gt = hostmath.label_to_matrix_np(LABEL, y[j])
            rows.append({
                "dy_fused_exact": float(np.abs(y_f[j] - y_e[j]).max()),
                "dt_fused_exact": float(
                    np.linalg.norm(m_f[:3, 3] - m_e[:3, 3])),
                "dr_fused_exact": float(rot_err_deg(m_f, m_e)),
                "dt_bf16_f32": float(np.linalg.norm(m_b[:3, 3] - m_f[:3, 3])),
                "dr_bf16_f32": float(rot_err_deg(m_b, m_f)),
                "t_err_fused": float(np.linalg.norm(m_f[:3, 3] - m_gt[:3, 3])),
                "t_err_exact": float(np.linalg.norm(m_e[:3, 3] - m_gt[:3, 3])),
                "r_err_fused": float(rot_err_deg(m_f, m_gt)),
                "r_err_exact": float(rot_err_deg(m_e, m_gt)),
            })
        print(f"evaluated {i + b}/{args.pairs} pairs", flush=True)

    def agg(key):
        v = np.array([r[key] for r in rows])
        return float(v.mean()), float(v.max())

    summary = {k: {"mean": agg(k)[0], "max": agg(k)[1]} for k in rows[0]}
    rel_t = (summary["dt_fused_exact"]["mean"]
             / max(summary["t_err_exact"]["mean"], 1e-9))
    rel_r = (summary["dr_fused_exact"]["mean"]
             / max(summary["r_err_exact"]["mean"], 1e-9))

    print(f"\n=== fused vs exact parity ({args.pairs} pairs, "
          f"n={n}, trained {args.train_steps} steps) ===")
    print(f"{'metric':>22}  {'mean':>10}  {'max':>10}")
    for k, v in summary.items():
        print(f"{k:>22}  {v['mean']:10.5f}  {v['max']:10.5f}")
    print(f"\nrelative drift (fused-exact / exact-vs-gt): "
          f"trans {rel_t:.2%}, rot {rel_r:.2%}")

    if args.json:
        summary["relative_drift"] = {"trans": rel_t, "rot": rel_r}
        summary["config"] = {"pairs": args.pairs, "num_points": n,
                             "train_steps": args.train_steps}
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
