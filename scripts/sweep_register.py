#!/usr/bin/env python
"""A/B sweep of register-path (motion embedding) formulations on real TPU.

The register path after encode is: kNN (template -> source), a 164k-row
gather of layer-1 terms, the tail MLP, the radius mask, and the max over
neighbors.  Row gathers are per-row priced on TPU, so the two gathers
(layer-1 terms (B,P,k,H1) + coordinates (B,P,k,3)) are candidate levers:

  v0_current   exact composition the model runs today
               (deepclr_tpu/models/deepclr.py MotionEmbedding)
  v1_d2mask    radius mask from kNN's returned squared distances
               (drops the (B,P,k,3) coordinate gather + norm)
  v2_onehot2   v1 + layer-1 term gather as one-hot matmuls: a split into
               bf16 hi/lo so two MXU passes reproduce f32 rows
               (row selection is exact per pass; hi+lo ~ f32)
  v3_onehot1   v1 + single bf16 one-hot matmul (precision floor probe —
               NOT candidate for shipping, truncates a to bf16)

Each variant returns summed output so timing measures kernels, not the
relay's per-buffer fetch overhead (docs/roofline.md).

Usage: python scripts/sweep_register.py [--batch 8] [--iters 10]
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
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd of each variant")
    args = ap.parse_args()

    from deepclr_tpu.models import build_model, init_params
    from deepclr_tpu.ops import group_points, knn

    b, n = args.batch, args.n
    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=n,
                            batch_size=b)

    template = _kitti_like_clouds(b, n, 4, seed=1)
    source = _kitti_like_clouds(b, n, 4, seed=2)
    f0 = jax.jit(lambda v, t: model.apply(v, t, method="encode"))(
        variables, template)
    f1 = jax.jit(lambda v, s: model.apply(v, s, method="encode"))(
        variables, source)
    f0, f1 = jax.block_until_ready((f0, f1))

    me = variables["params"]["merge"]["mlp"]
    w1 = me["dense_0"]["kernel"]
    b1 = me["dense_0"]["bias"]
    tail = [(me[f"dense_{i}"]["kernel"], me[f"dense_{i}"]["bias"])
            for i in range(1, 3)]
    pd = 3
    k = 20
    radius = 10.0
    hp = jax.lax.Precision.HIGHEST

    def _split_terms(f0, f1):
        xyz0, feat0 = f0[..., :pd], f0[..., pd:]
        xyz1, feat1 = f1[..., :pd], f1[..., pd:]
        wd = w1[:pd]
        w0 = w1[pd:pd + feat0.shape[-1]]
        wf = w1[pd + feat0.shape[-1]:]
        a = (jnp.dot(xyz1, wd, precision=hp)
             + jnp.dot(feat1, wf, precision=hp) + b1)
        bp = jnp.dot(feat0, w0, precision=hp) - jnp.dot(xyz0, wd, precision=hp)
        return xyz0, xyz1, a, bp

    def _tail_mask_max(h, masked, xyz0):
        cd = jnp.bfloat16
        h = h.astype(cd)
        for w, bb in tail:
            h = jnp.maximum(jnp.dot(h, w.astype(cd)) + bb.astype(cd), 0.0)
        h = jnp.where(masked, jnp.zeros_like(h), h)
        feat = jnp.max(h, axis=-2).astype(jnp.float32)
        return jnp.sum(jnp.concatenate([xyz0, feat], axis=-1))

    # ---- v0: today's composition --------------------------------------
    def v0_current(f0, f1):
        xyz0, xyz1, a, bp = _split_terms(f0, f1)
        idx, _ = knn(jax.lax.stop_gradient(xyz0),
                     jax.lax.stop_gradient(xyz1), k)
        a_g = group_points(a, idx)
        h = jnp.maximum(a_g + bp[:, :, None, :], 0.0)
        pos_diff = group_points(xyz1, idx) - xyz0[:, :, None, :]
        dist = jnp.linalg.norm(pos_diff, axis=-1, keepdims=True)
        return _tail_mask_max(h, dist >= radius, xyz0)

    # ---- v1: mask straight from kNN d2 ---------------------------------
    def v1_d2mask(f0, f1):
        xyz0, xyz1, a, bp = _split_terms(f0, f1)
        idx, d2 = knn(jax.lax.stop_gradient(xyz0),
                      jax.lax.stop_gradient(xyz1), k)
        a_g = group_points(a, idx)
        h = jnp.maximum(a_g + bp[:, :, None, :], 0.0)
        return _tail_mask_max(h, (d2 >= radius * radius)[..., None], xyz0)

    # ---- one-hot gather helpers ----------------------------------------
    def _onehot(idx, nsrc, dtype):
        bsz, p_, k_ = idx.shape
        flat = idx.reshape(bsz, p_ * k_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nsrc), 2)
        return (flat[..., None] == iota).astype(dtype)

    def v2_onehot2(f0, f1):
        xyz0, xyz1, a, bp = _split_terms(f0, f1)
        idx, d2 = knn(jax.lax.stop_gradient(xyz0),
                      jax.lax.stop_gradient(xyz1), k)
        oh = _onehot(idx, a.shape[1], jnp.bfloat16)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rows = (jnp.einsum("bqn,bnh->bqh", oh, a_hi,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("bqn,bnh->bqh", oh, a_lo,
                             preferred_element_type=jnp.float32))
        a_g = rows.reshape(a.shape[0], -1, k, a.shape[-1])
        h = jnp.maximum(a_g + bp[:, :, None, :], 0.0)
        return _tail_mask_max(h, (d2 >= radius * radius)[..., None], xyz0)

    def v3_onehot1(f0, f1):
        xyz0, xyz1, a, bp = _split_terms(f0, f1)
        idx, d2 = knn(jax.lax.stop_gradient(xyz0),
                      jax.lax.stop_gradient(xyz1), k)
        oh = _onehot(idx, a.shape[1], jnp.bfloat16)
        rows = jnp.einsum("bqn,bnh->bqh", oh, a.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        a_g = rows.reshape(a.shape[0], -1, k, a.shape[-1])
        h = jnp.maximum(a_g + bp[:, :, None, :], 0.0)
        return _tail_mask_max(h, (d2 >= radius * radius)[..., None], xyz0)

    variants = [
        ("v0_current", v0_current),
        ("v1_d2mask", v1_d2mask),
        ("v2_onehot2", v2_onehot2),
        ("v3_onehot1", v3_onehot1),
    ]
    print(f"=== register sweep (batch={b}, n={n}, "
          f"backend={jax.default_backend()}) ===", flush=True)
    ref = None
    for name, fn in variants:
        ms = timeit(fn, f0, f1, iters=args.iters)
        val = float(jax.jit(fn)(f0, f1))
        note = ""
        if ref is None:
            ref = val
        else:
            note = f"  (sum rel-dev {abs(val - ref) / abs(ref):.2e})"
        print(f"{name:>12}: {ms:8.2f} ms{note}", flush=True)

    if not args.grad:
        return

    # fwd+bwd: grads w.r.t. the encode features — the path the train step
    # differentiates (the take-path backward is a 164k-row scatter-add;
    # the one-hot backward is the transposed matmul)
    print("--- fwd+bwd (grad wrt f0, f1; scalar-reduced) ---", flush=True)
    for name, fn in variants:
        def fb(f0, f1, fn=fn):
            val, (g0, g1) = jax.value_and_grad(fn, argnums=(0, 1))(f0, f1)
            return val + jnp.sum(g0) + jnp.sum(g1)

        ms = timeit(fb, f0, f1, iters=args.iters)
        print(f"{name:>12}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
