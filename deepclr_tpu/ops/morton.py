"""Morton (Z-order) spatial sorting for point clouds.

Sorting points by Morton code makes consecutive points spatially adjacent,
which lets the fused set-abstraction kernel skip (center-tile x point-chunk)
blocks whose bounding boxes are farther apart than the search radius — the
TPU-native replacement for the spatial pruning a CUDA kernel gets from its
per-ball early exit.  Set semantics (radius membership, max-pool) are
order-invariant, so sorting changes nothing about the result.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["morton_code", "spatial_sort", "morton_argsort_np"]

_BITS = 10  # 10 bits per axis -> 30-bit codes, 1024 cells per axis


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_code(xyz, mask=None):
    """Per-point Morton codes; invalid points get the maximum key (sort last).

    All axes share one metric scale (cubic cells): per-axis normalization
    would give a thin axis (LiDAR z) the same bit budget as the wide ones,
    fragmenting xy-locality and inflating the chunk AABBs the fused-SA
    kernel culls with (measured 2x worse survival on KITTI-like clouds).

    Args:
      xyz: (B, N, 3) coordinates.
      mask: optional (B, N) validity.

    Returns:
      (B, N) uint32 keys.
    """
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    scale = (2 ** _BITS - 1) / jnp.maximum(
        jnp.max(hi - lo, axis=-1, keepdims=True), 1e-6
    )
    q = jnp.clip((xyz - lo) * scale, 0, 2 ** _BITS - 1).astype(jnp.uint32)
    code = (
        (_expand_bits(q[..., 0]) << 2)
        | (_expand_bits(q[..., 1]) << 1)
        | _expand_bits(q[..., 2])
    )
    if mask is not None:
        code = jnp.where(mask, code, jnp.uint32(0xFFFFFFFF))
    return code


def morton_argsort_np(xyz: np.ndarray) -> np.ndarray:
    """Host (numpy) Morton argsort of one un-padded cloud: (N, >=3) -> (N,).

    The host data pipeline sorts each cloud once at batch-assembly time
    (data/batching.py) so the device forward can skip its own
    ``spatial_sort`` (model param ``presorted``).  Locality — the only
    thing the fused-SA kernel's block culling needs — survives the rigid
    on-device augmentations, so host order is as good as a device re-sort.
    Same cubic-cell quantization as ``morton_code``; numpy uint32 shifts
    wrap exactly like the XLA ones.
    """
    q = xyz[:, :3].astype(np.float64)
    lo = q.min(axis=0)
    scale = (2 ** _BITS - 1) / max(float((q.max(axis=0) - lo).max()), 1e-6)
    v = np.clip((q - lo) * scale, 0, 2 ** _BITS - 1).astype(np.uint32)
    v = (v | (v << np.uint32(16))) & np.uint32(0x030000FF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x0300F00F)
    v = (v | (v << np.uint32(4))) & np.uint32(0x030C30C3)
    v = (v | (v << np.uint32(2))) & np.uint32(0x09249249)
    code = (v[:, 0] << np.uint32(2)) | (v[:, 1] << np.uint32(1)) | v[:, 2]
    return np.argsort(code, kind="stable")


def spatial_sort(xyz, features=None, mask=None, return_order: bool = False):
    """Sort a padded cloud by Morton code (invalid points move to the end).

    One multi-operand lax.sort carries every channel through the sort
    directly — XLA's TPU sort is cheap, while the argsort + take_along_axis
    formulation pays for full-cloud gathers (measured ~4 ms per 16x16k-pt
    batch on v5e just for the gathers).  Every operand costs a slice of the
    sort's compare-exchange passes, so the original index channel is only
    carried when asked for (``return_order``), and the sorted mask is
    recovered from the key itself: invalid points carry the 0xFFFFFFFF
    sentinel, which no real 30-bit code can equal.

    Returns (xyz, features, mask, order) with the same shapes; ``order`` is
    None unless ``return_order`` is set.
    """
    code = morton_code(xyz, mask)
    chans = [xyz[..., k] for k in range(3)]
    n_feat = 0 if features is None else features.shape[-1]
    chans += [features[..., k] for k in range(n_feat)]
    if return_order:
        chans.insert(0, jax.lax.broadcasted_iota(jnp.int32, code.shape, 1))
    out = jax.lax.sort([code, *chans], dimension=1, num_keys=1)
    base = 2 if return_order else 1
    order = out[1] if return_order else None
    xyz = jnp.stack(out[base:base + 3], axis=-1)
    features = (
        jnp.stack(out[base + 3:base + 3 + n_feat], axis=-1)
        if features is not None else None
    )
    mask = (out[0] != jnp.uint32(0xFFFFFFFF)) if mask is not None else None
    return xyz, features, mask, order
