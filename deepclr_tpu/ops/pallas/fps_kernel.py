"""Pallas TPU kernel: furthest point sampling, all clouds in one instance.

Sequential argmax selection with every cloud resident in VMEM — the XLA
fallback dispatches one tiny HBM-bound step per selected point, this kernel
keeps the running min-distance caches on-chip.

All B clouds are processed by ONE kernel instance: each fori_loop iteration
selects point i for every cloud, with the per-cloud work unrolled inside
the body.  The B selection chains are data-independent, so the VPU
interleaves them and the (reduce -> select -> update) latency of one cloud
hides behind the others' work — measured ~3x faster than the per-cloud
grid=(B,) variant it replaces (12 ms -> 4 ms for 16x 16k-pt clouds).

Layout: each cloud's points are viewed as an (R=128, C=N/128) grid
(row-major flat index j = r*C + c) so every VPU op runs on full (8,128)
tiles:

  xyz   (B, 3, R, C) f32   coordinate planes
  m     (B, R, C)    f32   validity (0/1)
  out   (B, P)       i32   selected flat indices (SMEM: the per-iteration
                           store needs dynamic scalar indexing)

Per selected point and cloud: distance update to the last pick (VPU),
running min, masked argmax (invalid points pinned to -1).  Matches the
reference CUDA kernel's semantics (start at the first valid index,
ties -> lowest index; reference extern/pointnet2.patch:306-320).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas", "fps_pallas_available"]

_ROWS = 128


def fps_pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _make_kernel(batch: int, npoint: int, rows: int, cols: int):
    def kernel(xyz_ref, m_ref, out_ref, dists_ref):
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        flat_idx = row_ids * cols + col_ids
        big = jnp.int32(rows * cols)

        firsts = []
        for bi in range(batch):
            valid = m_ref[bi] > 0.5
            # first pick: lowest-index valid point
            first = jnp.min(jnp.where(valid, flat_idx, big))
            out_ref[bi, 0] = first
            dists_ref[bi] = jnp.where(valid, 1e10, -1.0)
            firsts.append(first)

        def body(i, lasts):
            nxts = []
            for bi in range(batch):
                # coordinates of the last pick via select-reduce (dynamic
                # lane indexing is not supported by Mosaic)
                sel = flat_idx == lasts[bi]
                d2 = None
                for k in range(3):
                    plane = xyz_ref[bi, k]
                    ck = jnp.sum(jnp.where(sel, plane, 0.0))
                    dx = plane - ck
                    d2 = dx * dx if d2 is None else d2 + dx * dx
                # invalid points were pinned to -1 at init; d2 >= 0 means
                # min() can never resurrect them, so no per-iteration mask
                dists = jnp.minimum(dists_ref[bi], d2)
                dists_ref[bi] = dists
                # first (lowest-index) argmax, Mosaic-safe
                mx = jnp.max(dists)
                nxt = jnp.min(jnp.where(dists == mx, flat_idx, big))
                out_ref[bi, i] = nxt
                nxts.append(nxt)
            return tuple(nxts)

        jax.lax.fori_loop(1, npoint, body, tuple(firsts))

    return kernel


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_pallas(xyz, npoint: int, mask=None):
    """(B, N, 3) f32 [+ (B, N) mask] -> (B, npoint) int32 indices."""
    b, n, _ = xyz.shape
    assert n % _ROWS == 0, f"N={n} must be a multiple of {_ROWS}"
    cols = n // _ROWS

    planes = jnp.transpose(xyz, (0, 2, 1)).reshape(b, 3, _ROWS, cols)
    if mask is None:
        m = jnp.ones((b, _ROWS, cols), jnp.float32)
    else:
        m = mask.astype(jnp.float32).reshape(b, _ROWS, cols)

    kernel = _make_kernel(b, npoint, _ROWS, cols)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((b, _ROWS, cols), jnp.float32)],
    )(planes, m)
    return out
