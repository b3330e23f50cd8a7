"""Pairwise squared distances — the workhorse behind kNN / ball query.

Computed as ||a||² + ||b||² − 2·a·bᵀ so the O(N·M) term is a matmul that XLA
places on the MXU, instead of materializing (N, M, 3) differences.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pairwise_sqdist"]


def pairwise_sqdist(a, b):
    """Squared euclidean distances between two point sets.

    Args:
      a: (..., N, D) query points.
      b: (..., M, D) reference points.

    Returns:
      (..., N, M) squared distances, clamped to >= 0 (the matmul form can go
      slightly negative in floating point).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    # precision='highest': distances feed neighbor *selection* (argmin /
    # thresholds), where jax's default bf16 matmul precision would flip
    # borderline neighbors; full f32 passes keep selection exact.
    cross = jnp.einsum(
        "...nd,...md->...nm",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision="highest",
    )
    d2 = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross
    return jnp.maximum(d2, 0.0)
