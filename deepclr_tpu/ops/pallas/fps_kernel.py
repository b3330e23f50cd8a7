"""Pallas TPU kernel: furthest point sampling.

Sequential argmax selection with the whole cloud resident in VMEM — the XLA
fallback dispatches one tiny HBM-bound step per selected point, this kernel
keeps the running min-distance cache on-chip.

Layout: points are viewed as an (R=128, C=N/128) grid (row-major flat index
j = r*C + c) so every VPU op runs on full (8,128) tiles:

  xyz   (B, 3, R, C) f32   coordinate planes
  m     (B, R, C)    f32   validity (0/1)
  out   (B, P)       i32   selected flat indices

Per selected point: distance update to the last pick (VPU), running min,
masked argmax (invalid points pinned to -1).  Matches the reference CUDA
kernel's semantics (start at the first valid index, ties -> lowest index;
extern/pointnet2.patch:306-320).
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


def _make_kernel(npoint: int, rows: int, cols: int):
    def kernel(xyz_ref, m_ref, out_ref, dists_ref):
        m = m_ref[0]   # (R, C)
        valid = m > 0.5

        # flat row-major point index per grid cell
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        flat_idx = row_ids * cols + col_ids
        big = jnp.int32(rows * cols)

        def argmax2d(x):
            """First (lowest-index) argmax of a 2-D array, Mosaic-safe."""
            mx = jnp.max(x)
            return jnp.min(jnp.where(x == mx, flat_idx, big))

        # first pick: lowest-index valid point
        first = jnp.min(jnp.where(valid, flat_idx, big))
        out_ref[0, 0, 0] = first

        dists_ref[:, :] = jnp.where(valid, 1e10, -1.0)

        def body(i, last):
            # coordinates of the last pick via select-reduce (dynamic lane
            # indexing is not supported by Mosaic)
            sel = flat_idx == last
            d2 = None
            for k in range(3):
                plane = xyz_ref[0, k]
                ck = jnp.sum(jnp.where(sel, plane, 0.0))
                dx = plane - ck
                d2 = dx * dx if d2 is None else d2 + dx * dx
            dists = jnp.minimum(dists_ref[:, :], jnp.where(valid, d2, -1.0))
            dists_ref[:, :] = dists
            nxt = argmax2d(dists)
            out_ref[0, 0, i] = nxt
            return nxt

        jax.lax.fori_loop(1, npoint, body, first)

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

    kernel = _make_kernel(npoint, _ROWS, cols)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, _ROWS, cols), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, cols), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # SMEM output: the per-iteration index store needs dynamic scalar
        # indexing, which VMEM lane stores do not support
        out_specs=pl.BlockSpec((1, 1, npoint), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((_ROWS, cols), jnp.float32)],
    )(planes, m)
    return out[:, 0, :]
