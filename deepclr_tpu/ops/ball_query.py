"""Ball query: fixed-size radius neighborhoods around sampled centers.

Reproduces the reference CUDA kernel's contract
(/root/reference/extern/pointnet2.patch:101-116, upstream ball_query_gpu.cu):
for each center, take the first ``nsample`` points (in index order) whose
squared distance is < radius²; unfilled slots repeat the *first* in-radius
index; centers with no in-radius point return all zeros.

The fixed-shape TPU formulation: build the (P, N) hit matrix, rank hits with a
cumulative sum, and scatter column indices into their rank slot — O(P·N) with
no data-dependent shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pairwise import pairwise_sqdist

__all__ = ["ball_query", "ball_query_xla"]


def _ball_query_single(xyz, new_xyz, mask, radius: float, nsample: int):
    """One cloud: xyz (N,3), new_xyz (P,3), mask (N,) -> (P, nsample) i32."""
    n = xyz.shape[0]
    d2 = pairwise_sqdist(new_xyz, xyz)  # (P, N)
    hit = (d2 < radius * radius) & mask[None, :]  # (P, N)

    # Rank of each hit along the point axis; non-hits pushed out of range.
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1  # (P, N)
    rank = jnp.where(hit, rank, nsample)

    # Fill value: first in-radius index, or 0 if the ball is empty.
    first = jnp.argmax(hit, axis=-1).astype(jnp.int32)  # (P,)
    any_hit = jnp.any(hit, axis=-1)
    fill = jnp.where(any_hit, first, 0)

    cols = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)  # (P, N)
    out = jnp.broadcast_to(fill[:, None], (new_xyz.shape[0], nsample))
    rows = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 0)
    out = out.at[rows, jnp.minimum(rank, nsample)].set(
        cols, mode="drop", unique_indices=False
    )
    return out


@partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query_xla(xyz, new_xyz, radius: float, nsample: int, mask=None):
    """Batched ball query.

    Args:
      xyz: (B, N, 3) points to group (padded).
      new_xyz: (B, P, 3) query centers.
      radius: static search radius.
      nsample: static neighborhood size.
      mask: optional (B, N) bool validity mask on xyz.

    Returns:
      (B, P, nsample) int32 indices into N.
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    new_xyz = jnp.asarray(new_xyz, jnp.float32)
    if mask is None:
        mask = jnp.ones(xyz.shape[:-1], bool)
    return jax.vmap(
        lambda x, nx, m: _ball_query_single(x, nx, m, radius, nsample)
    )(xyz, new_xyz, mask)


def ball_query(xyz, new_xyz, radius: float, nsample: int, mask=None):
    """Public entry point; dispatches to the best backend implementation."""
    return ball_query_xla(xyz, new_xyz, radius, nsample, mask=mask)
