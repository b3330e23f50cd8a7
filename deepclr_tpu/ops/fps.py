"""Furthest point sampling (FPS) on fixed-shape, masked point clouds.

Semantics follow the reference CUDA kernel
(/root/reference/extern/pointnet2.patch:306-320, upstream
sampling_gpu.cu): start from index 0, then repeatedly pick the point with the
maximum distance to the already-selected set, maintaining a running
min-distance per point.

Mask handling (new here — the reference crops clouds host-side instead):
invalid points keep a running distance of −1 so they are never selected while
any valid point remains.  If ``npoint`` exceeds the number of valid points the
selection repeats points, which downstream grouping tolerates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["furthest_point_sample", "furthest_point_sample_xla"]


def _fps_single(xyz, mask, npoint: int):
    """FPS for one cloud. xyz: (N, 3) f32, mask: (N,) bool -> (npoint,) i32."""
    n = xyz.shape[0]
    big = jnp.float32(1e10)
    # Running min squared distance to the selected set.
    dists0 = jnp.where(mask, big, -1.0)

    # First selected point: lowest-index valid point (index 0 when unpadded,
    # matching the CUDA kernel's hardcoded start).
    first = jnp.argmax(mask).astype(jnp.int32)

    idxs0 = jnp.zeros((npoint,), jnp.int32).at[0].set(first)

    def body(i, carry):
        dists, idxs = carry
        last = idxs[i - 1]
        diff = xyz - xyz[last]
        d = jnp.sum(diff * diff, axis=-1)
        dists = jnp.minimum(dists, jnp.where(mask, d, -1.0))
        nxt = jnp.argmax(dists).astype(jnp.int32)
        return dists, idxs.at[i].set(nxt)

    _, idxs = jax.lax.fori_loop(1, npoint, body, (dists0, idxs0))
    return idxs


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_xla(xyz, npoint: int, mask=None):
    """Batched FPS.

    Args:
      xyz: (B, N, 3) float32 point coordinates (padded).
      npoint: static number of samples to draw.
      mask: optional (B, N) bool validity mask; None means all valid.

    Returns:
      (B, npoint) int32 indices into N.
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    if mask is None:
        mask = jnp.ones(xyz.shape[:-1], bool)
    return jax.vmap(lambda x, m: _fps_single(x, m, npoint))(xyz, mask)


def furthest_point_sample(xyz, npoint: int, mask=None):
    """Public entry point; dispatches to the best backend implementation."""
    from .pallas.fps_kernel import (
        fps_pallas_available,
        furthest_point_sample_pallas,
    )

    if fps_pallas_available() and xyz.shape[1] % 128 == 0:
        return furthest_point_sample_pallas(xyz, npoint, mask=mask)
    return furthest_point_sample_xla(xyz, npoint, mask=mask)
