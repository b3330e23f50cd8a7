#!/usr/bin/env python
"""Backward-pass attribution for the flagship KITTI train step on real TPU.

profile_train.py gives three coarse numbers (forward, fwd+bwd, full step);
this script splits the backward into its structural pieces so the next
optimization target is measured, not guessed:

  * fused-SA fwd+bwd alone (plain kernel forward + equality-select
    backward kernel since r3), w.r.t. the SA weights only,
  * the legacy winner row gather alone — the ~15 ms (B, P*H3)-row gather
    the equality-select backward eliminated; kept as a reference point,
  * register (motion embedding + head) fwd+bwd alone on precomputed
    features,
  * full model fwd+bwd (== profile_train.py's vg) for the residual.

Honest host-fetch sync everywhere (scalar reductions inside jit).

Usage: python scripts/profile_backward.py [--batch 8] [--n 16384]
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


def _scalar_grad(fn):
    """jit(value_and_grad) reduced to one scalar (avoids per-buffer
    dispatch overhead through the relayed client)."""
    def wrapped(p, *args):
        v, g = jax.value_and_grad(fn)(p, *args)
        return v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
    return jax.jit(wrapped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from deepclr_tpu.geometry import LabelType
    from deepclr_tpu.losses import make_loss_fn
    from deepclr_tpu.models import build_model, init_params
    from deepclr_tpu.ops import furthest_point_sample, gather_points
    from deepclr_tpu.ops.fused_sa import ball_mlp_max, multi_scale_bundle
    from deepclr_tpu.ops.morton import spatial_sort

    b, n = args.batch, args.n
    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=n,
                            batch_size=b)
    params = variables["params"]

    template = _kitti_like_clouds(b, n, 4, seed=1)
    source = _kitti_like_clouds(b, n, 4, seed=2)
    clouds = jnp.concatenate([template, source], axis=0)

    motion = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    motion[:, 0, 3] = 0.5
    y = jnp.asarray(LabelType.POSE3D_DUAL_QUAT.from_matrix(motion),
                    jnp.float32)
    loss_cfg = [
        {"type": "trans", "weights": [1.0], "params": {"p": 2}},
        {"type": "rot", "weights": [200.0], "params": {"p": 2}},
    ]
    loss_fn = make_loss_fn(loss_cfg, LabelType.POSE3D_DUAL_QUAT)

    results = {}

    # ---- full fwd+bwd (baseline) ---------------------------------------
    def full_loss(params, template, source):
        y_pred, _ = model.apply({"params": params}, template, source)
        return jnp.sum(loss_fn(y_pred, y))

    results["full fwd+bwd"] = timeit(
        _scalar_grad(full_loss), params, template, source, iters=args.iters)

    # ---- fused SA fwd+bwd on presorted clouds --------------------------
    xyz = clouds[..., :3]
    feats = clouds[..., 3:]
    xyz_s, feats_s, _, _ = jax.jit(lambda x, f: spatial_sort(x, f, None))(
        xyz, feats)
    fps_idx = jax.jit(lambda x: furthest_point_sample(x, 1024))(xyz_s)
    centers = jax.jit(gather_points)(xyz_s, fps_idx)
    centers_s, _, _, _ = jax.jit(lambda c: spatial_sort(c))(centers)
    xyz_s, feats_s, centers_s = jax.block_until_ready(
        (xyz_s, feats_s, centers_s))

    sa = params["cloud_features"]["sa0"]
    mlps = KITTI_MODEL_CFG["params"]["cloud_features"]["params"]["mlps"][0]
    radii = KITTI_MODEL_CFG["params"]["cloud_features"]["params"]["radii"][0]
    sa_w = [[sa[f"scale{si}_w{li}"] for li in range(len(mlps[si]))]
            for si in range(len(mlps))]
    sa_b = [[sa[f"scale{si}_b{li}"] for li in range(len(mlps[si]))]
            for si in range(len(mlps))]

    def sa_loss(wb, xyz_s, centers_s, feats_s):
        weights, biases, radius_cols = multi_scale_bundle(
            wb[0], wb[1], radii)
        out = ball_mlp_max(xyz_s, centers_s, weights, biases, radius_cols,
                           features=feats_s, compute_dtype=jnp.bfloat16)
        return jnp.sum(out)

    results["fused SA fwd+bwd (dweights)"] = timeit(
        _scalar_grad(sa_loss), (sa_w, sa_b), xyz_s, centers_s, feats_s,
        iters=args.iters)

    results["fused SA fwd only"] = timeit(
        jax.jit(lambda wb, x, c, f: sa_loss(wb, x, c, f)),
        (sa_w, sa_b), xyz_s, centers_s, feats_s, iters=args.iters)

    # ---- legacy winner row gather (eliminated by the r3 backward) ------
    p_centers, h3 = 1024, 64
    rng = np.random.default_rng(0)
    js = jnp.asarray(rng.integers(0, n, size=(2 * b, p_centers * h3)),
                     jnp.int32)
    src = jnp.concatenate([xyz_s, feats_s], axis=-1)

    def gather_only(src, js):
        rows = jnp.take_along_axis(src, js[..., None], axis=1)
        return jnp.sum(rows)

    results["winner row gather (legacy)"] = timeit(
        jax.jit(gather_only), src, js, iters=args.iters)

    # ---- register fwd+bwd on precomputed features ----------------------
    f0 = jax.jit(lambda v, t: model.apply(v, t, method="encode"))(
        variables, template)
    f1 = jax.jit(lambda v, s: model.apply(v, s, method="encode"))(
        variables, source)
    f0, f1 = jax.block_until_ready((f0, f1))

    def register_loss(params, f0, f1):
        y_pred = model.apply({"params": params}, f0, f1, method="register")
        return jnp.sum(loss_fn(y_pred, y))

    results["register fwd+bwd"] = timeit(
        _scalar_grad(register_loss), params, f0, f1, iters=args.iters)

    # ---- register fwd+bwd INCLUDING d(features) ------------------------
    # in the real step the cotangent flows into the SA outputs; measure the
    # register backward with feature grads to capture that extra cost
    def register_loss_df(ff, params):
        y_pred = model.apply({"params": params}, ff[0], ff[1],
                             method="register")
        return jnp.sum(loss_fn(y_pred, y))

    results["register fwd+bwd (+dfeat)"] = timeit(
        _scalar_grad(register_loss_df), (f0, f1), params, iters=args.iters)

    print(f"\n=== backward profile (batch={b}, n={n}, "
          f"backend={jax.default_backend()}) ===")
    for k, v in results.items():
        print(f"{k:>28}: {v:8.2f} ms")
    sa_bwd = (results["fused SA fwd+bwd (dweights)"]
              - results["fused SA fwd only"])
    print(f"{'-> SA backward alone':>28}: {sa_bwd:8.2f} ms")


if __name__ == "__main__":
    main()
