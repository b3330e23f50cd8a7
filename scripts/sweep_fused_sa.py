#!/usr/bin/env python
"""Fused-SA kernel variant sweep on real TPU: d2 precision x tile shapes.

Times ball_mlp_max_pallas under the KITTI bundle (16 clouds x 16k pts,
npoint 1024) for each variant, and reports max |out| deviation vs the
f32-d2 baseline.  Honest host-fetch sync (scalar reduce inside jit).

Usage: python scripts/sweep_fused_sa.py [--n 16384] [--batch 16]
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


def timeit(jfn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    # compiles between prints run minutes; keep partial sweeps visible
    # under redirects/timeouts
    sys.stdout.reconfigure(line_buffering=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)  # 2B clouds
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--backward", action="store_true",
                    help="also sweep the equality-select backward kernel's "
                         "tile axis (compiles are slow at unrolled-heavy "
                         "tilings; see docs/kernels.md)")
    ap.add_argument("--skip-forward", action="store_true",
                    help="skip the forward variant sweep (baseline only)")
    ap.add_argument("--residuals", action="store_true",
                    help="sweep the backward WITH forward residuals "
                         "(geo/a_p/cull bitmap reuse — the r5 production "
                         "path)")
    ap.add_argument("--bwd-configs", type=str, default=None,
                    help="comma list 'tile/stream/inner/splits' to restrict "
                         "the backward sweep (each compile is 20-120 s on "
                         "the remote-compile path)")
    args = ap.parse_args()

    from deepclr_tpu.models import build_model, init_params
    from deepclr_tpu.ops import furthest_point_sample, gather_points
    from deepclr_tpu.ops.fused_sa import multi_scale_bundle
    from deepclr_tpu.ops.morton import spatial_sort
    from deepclr_tpu.ops.pallas.fused_sa_kernel import ball_mlp_max_pallas

    b, n = args.batch, args.n
    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=n,
                            batch_size=1)

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(b, n, 3)).astype(np.float32)
    pts *= np.array([30.0, 30.0, 2.0], np.float32)
    feats = rng.uniform(0.0, 1.0, size=(b, n, 1)).astype(np.float32)

    xyz_s, feats_s, _, _ = jax.jit(
        lambda x, f: spatial_sort(jnp.asarray(x), jnp.asarray(f), None)
    )(pts, feats)
    fps_idx = jax.jit(lambda x: furthest_point_sample(x, 1024))(xyz_s)
    centers = jax.jit(gather_points)(xyz_s, fps_idx)
    centers_s, _, _, _ = jax.jit(lambda c: spatial_sort(c))(centers)
    xyz_s, feats_s, centers_s = jax.block_until_ready(
        (xyz_s, feats_s, centers_s))

    sa = variables["params"]["cloud_features"]["sa0"]
    cf = KITTI_MODEL_CFG["params"]["cloud_features"]["params"]
    mlps, radii = cf["mlps"][0], cf["radii"][0]
    scale_weights = [[sa[f"scale{si}_w{li}"] for li in range(len(mlps[si]))]
                     for si in range(len(mlps))]
    scale_biases = [[sa[f"scale{si}_b{li}"] for li in range(len(mlps[si]))]
                    for si in range(len(mlps))]
    weights, biases, radius_cols = multi_scale_bundle(
        scale_weights, scale_biases, radii)
    weights = tuple(weights)
    biases = tuple(biases)

    def make(d2_mode, tile, stream, inner):
        def fn(xyz_s, centers_s, feats_s):
            out = ball_mlp_max_pallas(
                xyz_s, centers_s, weights, biases, radius_cols,
                features=feats_s, compute_dtype=jnp.bfloat16,
                center_tile=tile, stream=stream, inner=inner,
                d2_mode=d2_mode,
            )
            return out

        return jax.jit(fn)

    ref_fn = make("f32", 16, 32, 32)
    ref_out = np.asarray(ref_fn(xyz_s, centers_s, feats_s))
    ref_ms = timeit(
        jax.jit(lambda a, c, f: jnp.sum(ref_fn(a, c, f))),
        xyz_s, centers_s, feats_s, iters=args.iters)
    print(f"{'variant':>32}: {'ms':>8}  max|dev|", flush=True)
    print(f"{'f32 d2, t16/s32/i32 (base)':>32}: {ref_ms:8.2f}  0")

    variants = [] if args.skip_forward else [("bf16", 16, 32, 32)]
    # tile-shape axis under the (default) f32 d2 mode — the original sweep's
    # tile readings were confounded by the since-removed "split" mode
    if not args.skip_forward:
        for tile, stream, inner in ((32, 32, 32), (8, 32, 32), (16, 64, 64),
                                    (16, 64, 32), (32, 64, 64), (16, 32, 16)):
            variants.append(("f32", tile, stream, inner))

    for mode, tile, stream, inner in variants:
        fn = make(mode, tile, stream, inner)
        try:
            out = np.asarray(fn(xyz_s, centers_s, feats_s))
            ms = timeit(
                jax.jit(lambda a, c, f, fn=fn: jnp.sum(fn(a, c, f))),
                xyz_s, centers_s, feats_s, iters=args.iters)
            dev = float(np.max(np.abs(out - ref_out)))
            mag = float(np.max(np.abs(ref_out)))
            print(f"{f'{mode} d2, t{tile}/s{stream}/i{inner}':>32}: "
                  f"{ms:8.2f}  {dev:.3e} (of {mag:.2f})")
        except Exception as e:  # pragma: no cover
            print(f"{f'{mode} t{tile}/s{stream}/i{inner}':>32}: FAILED {e}")

    if not args.backward:
        return

    # --- backward-kernel tile axis --------------------------------------
    # the bwd body carries ~2.5x the fwd's ops, and Mosaic's codegen falls
    # off a cliff past an unrolled-code-size threshold — fewer, larger
    # bodies win here even though the same tiling loses in the forward
    # (docs/kernels.md).  Gradients are tiling-independent, so deviation
    # vs the default-tiling backward must be ~0.
    from deepclr_tpu.ops.pallas.fused_sa_kernel import ball_mlp_max_bwd_pallas

    out_ref = jnp.asarray(ref_out)
    g = jnp.ones_like(out_ref)

    # r5: the production backward reuses forward residuals (geo/a_p/cull
    # bitmap) — sweep with them so relative tile costs match training
    res_pack = None
    if args.residuals:
        from deepclr_tpu.ops.pallas.fused_sa_kernel import ball_mlp_max_pallas

        _, res_pack = ball_mlp_max_pallas(
            xyz_s, centers_s, weights, biases, radius_cols,
            features=feats_s, compute_dtype=jnp.bfloat16,
            return_residuals=True,
        )
        res_pack = jax.tree_util.tree_map(jnp.asarray, res_pack)

    def make_bwd(tile, stream, inner, splits=1):
        def fn(xyz_s, centers_s, feats_s):
            res = ball_mlp_max_bwd_pallas(
                xyz_s, centers_s, weights, biases, radius_cols, g, out_ref,
                features=feats_s, compute_dtype=jnp.bfloat16,
                center_tile=tile, stream=stream, inner=inner,
                center_splits=splits, residuals=res_pack,
            )
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(res))
        return jax.jit(fn)

    print(f"\n{'backward variant':>32}: {'ms':>8}  scalar dev")
    bwd_ref = None
    # r4: mid-size tilings between the r3 sweep's extremes, plus
    # center-split variants — fine (cull-optimal) center tiles with the
    # unrolled program size divided across independent pallas_calls
    # (the cliff was observed at 64 unrolled bodies, 16/32/32)
    all_configs = (
        (64, 16, 16, 1), (64, 16, 8, 1), (64, 8, 8, 1),
        (256, 16, 16, 1), (64, 32, 16, 1), (128, 8, 8, 1),
        (32, 16, 16, 1), (32, 32, 32, 1), (32, 32, 16, 1),
        (64, 32, 32, 1), (16, 16, 16, 1),
        (16, 32, 32, 4), (16, 32, 32, 2), (32, 32, 32, 2),
        (16, 16, 16, 4), (16, 32, 32, 8), (64, 32, 32, 2))
    if args.bwd_configs:
        want = [tuple(int(x) for x in c.split("/"))
                for c in args.bwd_configs.split(",")]
        configs = [c for c in all_configs if c in want] + [
            c for c in want if c not in all_configs]
    else:
        configs = all_configs
    for tile, stream, inner, splits in configs:
        fn = make_bwd(tile, stream, inner, splits)
        tag = f"bwd t{tile}/s{stream}/i{inner}" + (
            f"/x{splits}" if splits > 1 else "")
        try:
            val = float(np.asarray(fn(xyz_s, centers_s, feats_s)))
            ms = timeit(fn, xyz_s, centers_s, feats_s, iters=args.iters)
            if bwd_ref is None:
                bwd_ref = val
            print(f"{tag:>32}: {ms:8.2f}  {abs(val - bwd_ref):.3e}")
        except Exception as e:  # pragma: no cover
            print(f"{tag:>32}: FAILED {e}")


if __name__ == "__main__":
    main()
