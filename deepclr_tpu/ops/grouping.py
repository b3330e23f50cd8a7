"""Gather / group: index-select points or neighborhoods.

Replaces the reference's ``gather_operation`` / ``grouping_operation`` CUDA
kernels (/root/reference/extern/pointnet2.patch:144-174, 275-304) with
channel-last ``take_along_axis`` forms.  XLA differentiates these to
scatter-adds, matching the hand-written CUDA grad kernels.

TPU perf note: gathers from *small* tables (the post-SA 1024-point clouds)
measure fine (~3-4 ms for (8,1024,20)x67 on v5e); the pathological case is
per-neighborhood gathers from raw 16k-point clouds, which the fused
set-abstraction path (ops/fused_sa.py) eliminates entirely.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gather_points", "group_points"]


def gather_points(points, idx):
    """Select points by index.

    Args:
      points: (B, N, C) features / coordinates.
      idx: (B, P) int32 indices into N.

    Returns:
      (B, P, C) gathered points.
    """
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def group_points(points, idx):
    """Select neighborhoods by index.

    Args:
      points: (B, N, C) features / coordinates.
      idx: (B, P, S) int32 indices into N.

    Returns:
      (B, P, S, C) grouped points.
    """
    b, n, c = points.shape
    _, p, s = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, p * s, 1), axis=-2)
    return flat.reshape(b, p, s, c)
