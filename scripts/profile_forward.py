#!/usr/bin/env python
"""Stage-level forward profiler for the flagship KITTI model on real TPU.

Times each pipeline stage (Morton sort, FPS, fused SA kernel, kNN+motion
embedding, pose head) separately with honest host-fetch sync (the relayed
backend's block_until_ready returns early; only a scalar fetch is reliable —
see .claude/skills/verify/SKILL.md). Every timed function reduces its output
to a scalar inside jit so the fetch doesn't measure tunnel bandwidth.

Usage: python scripts/profile_forward.py [--batch 8] [--n 16384]
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


def timeit(fn, *args, iters=10, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from deepclr_tpu.models import build_model, init_params
    from deepclr_tpu.ops import furthest_point_sample, gather_points, knn
    from deepclr_tpu.ops.fused_sa import ball_mlp_max, multi_scale_bundle
    from deepclr_tpu.ops.morton import spatial_sort

    b, n = args.batch, args.n
    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=n,
                            batch_size=b)

    template = _kitti_like_clouds(b, n, 4, seed=1)
    source = _kitti_like_clouds(b, n, 4, seed=2)
    clouds = jnp.concatenate([template, source], axis=0)  # (2B, N, 4)

    results = {}

    # ---- full forward --------------------------------------------------
    def full(variables, template, source):
        y, _ = model.apply(variables, template, source)
        return jnp.sum(y)

    results["full_forward"] = timeit(full, variables, template, source,
                                     iters=args.iters)

    # ---- encode only ---------------------------------------------------
    def encode2(variables, template, source):
        f0 = model.apply(variables, template, method="encode")
        f1 = model.apply(variables, source, method="encode")
        return jnp.sum(f0) + jnp.sum(f1)

    results["encode_both"] = timeit(encode2, variables, template, source,
                                    iters=args.iters)

    # ---- register only (on precomputed features) -----------------------
    f0 = jax.jit(lambda v, t: model.apply(v, t, method="encode"))(
        variables, template)
    f1 = jax.jit(lambda v, s: model.apply(v, s, method="encode"))(
        variables, source)
    f0, f1 = jax.block_until_ready((f0, f1))

    def register(variables, f0, f1):
        return jnp.sum(model.apply(variables, f0, f1, method="register"))

    results["register"] = timeit(register, variables, f0, f1,
                                 iters=args.iters)

    # ---- encode internals (2B clouds in one call, like the model) ------
    xyz = clouds[..., :3]
    feats = clouds[..., 3:]

    def sort_only(xyz, feats):
        sx, sf, _, _ = spatial_sort(xyz, feats, None)
        return jnp.sum(sx) + jnp.sum(sf)

    results["morton_sort_2B"] = timeit(sort_only, xyz, feats,
                                       iters=args.iters)

    xyz_s, feats_s, _, _ = jax.jit(lambda x, f: spatial_sort(x, f, None))(
        xyz, feats)
    xyz_s, feats_s = jax.block_until_ready((xyz_s, feats_s))

    def fps_only(xyz_s):
        return jnp.sum(furthest_point_sample(xyz_s, 1024))

    results["fps_2B"] = timeit(fps_only, xyz_s, iters=args.iters)

    fps_idx = jax.jit(
        lambda x: furthest_point_sample(x, 1024))(xyz_s)
    centers = jax.jit(gather_points)(xyz_s, fps_idx)
    centers_s, _, _, _ = jax.jit(lambda c: spatial_sort(c))(centers)
    centers_s = jax.block_until_ready(centers_s)

    # fused SA bundle with the model's real weights
    sa = variables["params"]["cloud_features"]["sa0"]
    mlps = KITTI_MODEL_CFG["params"]["cloud_features"]["params"]["mlps"][0]
    radii = KITTI_MODEL_CFG["params"]["cloud_features"]["params"]["radii"][0]
    scale_weights = [
        [sa[f"scale{si}_w{li}"] for li in range(len(mlps[si]))]
        for si in range(len(mlps))
    ]
    scale_biases = [
        [sa[f"scale{si}_b{li}"] for li in range(len(mlps[si]))]
        for si in range(len(mlps))
    ]

    def fused_sa_only(xyz_s, centers_s, feats_s):
        weights, biases, radius_cols = multi_scale_bundle(
            scale_weights, scale_biases, radii)
        out = ball_mlp_max(xyz_s, centers_s, weights, biases, radius_cols,
                           features=feats_s, compute_dtype=jnp.bfloat16)
        return jnp.sum(out)

    results["fused_sa_2B"] = timeit(fused_sa_only, xyz_s, centers_s, feats_s,
                                    iters=args.iters)

    # ---- register internals --------------------------------------------
    xyz0 = f0[..., :3]
    xyz1 = f1[..., :3]

    def knn_only(xyz0, xyz1):
        idx, d2 = knn(xyz0, xyz1, 20)
        return jnp.sum(idx) + jnp.sum(d2)

    results["knn"] = timeit(knn_only, xyz0, xyz1, iters=args.iters)

    # the k-neighbor row gather alone (motion embedding gathers layer-1
    # terms by the kNN indices; row gathers are per-row priced on TPU)
    idx_real = jax.jit(lambda a, c: knn(a, c, 20)[0])(xyz0, xyz1)
    idx_real = jax.block_until_ready(idx_real)

    def knn_gather_only(f1, idx):
        bsz, p_, k_ = idx.shape
        rows = jnp.take_along_axis(
            f1, idx.reshape(bsz, p_ * k_)[..., None], axis=1)
        return jnp.sum(rows)

    results["knn row gather"] = timeit(knn_gather_only, f1, idx_real,
                                       iters=args.iters)


    total_named = (results["morton_sort_2B"] + results["fps_2B"]
                   + results["fused_sa_2B"] + results["register"])
    print(f"\n=== profile (batch={b}, n={n}, backend={jax.default_backend()}) ===")
    for k, v in results.items():
        print(f"{k:>18}: {v:8.2f} ms")
    print(f"{'sum of stages':>18}: {total_named:8.2f} ms "
          f"(vs full {results['full_forward']:.2f})")
    print(f"pairs/s (full): {b / (results['full_forward'] / 1e3):.1f}")

    # ---- roofline: algorithmic + executed FLOP rates --------------------
    from deepclr_tpu.utils.flops import (
        model_flops_per_pair, peak_flops_per_chip,
    )

    peak = peak_flops_per_chip()
    pairs_per_sec = b / (results["full_forward"] / 1e3)
    algo = model_flops_per_pair(KITTI_MODEL_CFG, n)
    print("\n=== roofline ===")
    print(f"algorithmic: {algo / 1e9:.2f} GFLOP/pair -> "
          f"{pairs_per_sec * algo / 1e12:.2f} TFLOP/s delivered, "
          f"MFU {pairs_per_sec * algo / peak * 100:.2f}% of "
          f"{peak / 1e12:.0f} TFLOP/s peak")

    # executed FLOPs in the fused SA kernel: measured AABB-culling activity
    # x per-visit MAC count (mirrors ops/pallas/fused_sa_kernel.py)
    weights, biases, radius_cols = multi_scale_bundle(
        scale_weights, scale_biases, radii)
    h1 = int(weights[0].shape[1])
    groups = max(1, 128 // h1)
    tile, stream, inner = 16, 32, 32
    np_rows = n // groups
    n_sub = np_rows // inner
    p = centers_s.shape[1]
    n_tiles = p // tile
    r2_max = max(radius_cols) ** 2

    def active_frac(xyz_s, centers_s):
        pts_sub = xyz_s.reshape(2 * b, n_sub, inner * groups, 3)
        s_lo = jnp.min(pts_sub, axis=2)
        s_hi = jnp.max(pts_sub, axis=2)
        c_tiles = centers_s.reshape(2 * b, n_tiles, tile, 3)
        t_lo = jnp.min(c_tiles, axis=2)
        t_hi = jnp.max(c_tiles, axis=2)
        gap = jnp.maximum(
            jnp.maximum(s_lo[:, :, None, :] - t_hi[:, None, :, :],
                        t_lo[:, None, :, :] - s_hi[:, :, None, :]), 0.0)
        return jnp.mean((jnp.sum(gap * gap, -1) < r2_max).astype(jnp.float32))

    frac = float(jax.jit(active_frac)(xyz_s, centers_s))
    rows = tile * inner
    per_visit = rows * (groups * 4) * (groups * weights[-1].shape[-1])
    hdims = [w.shape for w in weights[1:]]
    for wshape in hdims:
        per_visit += rows * (groups * wshape[0]) * (groups * wshape[1])
    visits = 2 * b * n_sub * n_tiles * frac
    executed = 2.0 * per_visit * visits
    t_sa = results["fused_sa_2B"] / 1e3
    print(f"fused SA executed: active {frac * 100:.1f}% of "
          f"{n_sub}x{n_tiles} visits/cloud, "
          f"{executed / 1e12:.3f} TFLOP/2B-batch -> "
          f"{executed / t_sa / 1e12:.1f} TFLOP/s in-kernel "
          f"({executed / t_sa / peak * 100:.1f}% of peak)")


if __name__ == "__main__":
    main()
