"""three_nn / three_interpolate — feature propagation primitives.

Parity with the reference's FP-module kernels
(/root/reference/extern/pointnet2.patch:197-247): inverse-distance-weighted
interpolation from the 3 nearest known points.
"""
from __future__ import annotations

import jax.numpy as jnp

from .knn import knn

__all__ = ["three_nn", "three_interpolate"]


def three_nn(unknown, known, known_mask=None):
    """3 nearest known points for every unknown point.

    Args:
      unknown: (B, N, 3) query coordinates.
      known: (B, M, 3) reference coordinates.
      known_mask: optional (B, M) validity mask.

    Returns:
      (dist, idx): (B, N, 3) euclidean distances and int32 indices.
    """
    idx, d2 = knn(unknown, known, 3, points_mask=known_mask)
    return jnp.sqrt(d2), idx


def three_interpolate(features, idx, weight):
    """Weighted sum of 3 neighbor features.

    Args:
      features: (B, M, C) known features.
      idx: (B, N, 3) neighbor indices from three_nn.
      weight: (B, N, 3) interpolation weights.

    Returns:
      (B, N, C) interpolated features.
    """
    b, m, c = features.shape
    _, n, k = idx.shape
    gathered = jnp.take_along_axis(
        features, idx.reshape(b, n * k, 1), axis=-2
    ).reshape(b, n, k, c)
    return jnp.sum(gathered * weight[..., None], axis=-2)


def three_interpolate_weights(dist, eps: float = 1e-8):
    """Standard inverse-distance weights used by the reference FP module."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
