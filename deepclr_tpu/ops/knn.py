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
import numpy as np

from .pairwise import pairwise_sqdist

__all__ = ["knn", "knn_xla"]

# np (not jnp): a module-level jnp scalar would initialize jax backends at
# import time, breaking late jax.distributed.initialize on pods
_INF = np.float32(np.finfo(np.float32).max)


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
    if k <= _SMALLK_MAX:
        return _smallk_select(d2, k)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


# k masked-argmin sweeps beat lax.top_k while the sweep count is small:
# measured 1.28 vs 2.53 ms at (8, 1024, 1024, k=20) on v5e (exact same
# selection, ties -> lowest index for both).  Cost grows linearly in k, so
# large k falls back to top_k.
_SMALLK_MAX = 32


def _smallk_select(d2, k: int):
    """Exact k-smallest by k lexicographic (dist, index) argmin sweeps.

    The scan carries only the last selected (dist, index) per row — each
    sweep re-reads the distance matrix and excludes already-selected entries
    by the strict lexicographic order (d, i) > (d_last, i_last), instead of
    carrying and rewriting a masked copy of the whole matrix.  Measured on
    par with the rewrite-sweep at the production (8,1024,1024,k=20) on v5e
    (1.93 vs 1.95 ms; lax.top_k 3.09 ms) with 1/k the scan-carry footprint.
    Ties resolve to the lowest index, same as lax.top_k on negated inputs.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)

    def body(carry, _):
        last_d, last_i = carry
        later = (d2 > last_d[..., None]) | (
            (d2 == last_d[..., None]) & (iota > last_i[..., None])
        )
        dm = jnp.where(later, d2, _INF)
        dist = jnp.min(dm, axis=-1)
        pick = jnp.argmin(dm, axis=-1).astype(jnp.int32)
        return (dist, pick), (pick, dist)

    init = (
        jnp.full(d2.shape[:-1], -1.0, jnp.float32),
        jnp.full(d2.shape[:-1], -1, jnp.int32),
    )
    _, (idx, dist) = jax.lax.scan(body, init, None, length=k)
    return jnp.moveaxis(idx, 0, -1), jnp.moveaxis(dist, 0, -1)


def knn(query, points, k: int, points_mask=None):
    """Public entry point.

    XLA only, deliberately: a hand-written Pallas kNN (MXU-free
    per-coordinate distances + k masked-argmin sweeps) was tried and
    removed — its Mosaic compile is pathological on the current toolchain
    (a standalone (8, 1024, 1024, k=20) build exceeds 9.5 minutes).  The
    same sweep formulation expressed as a lax.scan compiles instantly and
    beats top_k at the production k=20 (see _smallk_select).
    """
    return knn_xla(query, points, k, points_mask=points_mask)
