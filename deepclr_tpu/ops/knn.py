"""Batched exact k-nearest-neighbors between two point sets.

Replaces torch_cluster.knn on the reference's hot path
(/root/reference/deepclr/models/deepclr.py:164-166): for each query point,
the k nearest reference points, nearest first.

TPU formulation: one (Q, N) distance matrix via MXU matmul + lax.top_k.
Masked reference points get +inf distance; masked query rows return index 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pairwise import pairwise_sqdist

__all__ = ["knn", "knn_xla"]

_INF = jnp.float32(jnp.finfo(jnp.float32).max)


@partial(jax.jit, static_argnames=("k",))
def knn_xla(query, points, k: int, points_mask=None):
    """Batched kNN.

    Args:
      query: (B, Q, D) query points.
      points: (B, N, D) reference points (padded).
      k: static neighbor count.
      points_mask: optional (B, N) bool validity mask on points.

    Returns:
      (idx, sqdist): (B, Q, k) int32 indices into N (nearest first) and the
      matching (B, Q, k) float32 squared distances.
    """
    query = jnp.asarray(query, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    d2 = pairwise_sqdist(query, points)  # (B, Q, N)
    if points_mask is not None:
        d2 = jnp.where(points_mask[:, None, :], d2, _INF)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


def knn(query, points, k: int, points_mask=None):
    """Public entry point.

    XLA only, deliberately: a hand-written Pallas kNN (MXU-free
    per-coordinate distances + k masked-argmin sweeps) was tried and
    removed — its Mosaic compile is pathological on the current toolchain
    (a standalone (8, 1024, 1024, k=20) build exceeds 9.5 minutes), and
    top_k contributes only ~2 ms to the full forward at production shapes,
    so the ceiling on any kernel win is ~1 ms.
    """
    return knn_xla(query, points, k, points_mask=points_mask)
