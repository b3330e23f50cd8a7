"""Batched quaternion algebra, usable under jit and on host numpy arrays.

Convention: quaternions are stored ``[w, x, y, z]`` (scalar first), the same
convention the reference framework inherits from transforms3d
(cf. /root/reference/deepclr/utils/quaternion.py:4-19 and
/root/reference/deepclr/data/labels.py:46-101).

All functions operate on the last axis and broadcast over leading axes, so the
same code path serves a single quaternion, a batch ``(B, 4)``, or a point grid
``(B, P, 4)``.  Written against ``jax.numpy`` — numpy inputs are accepted and
traced arrays work under jit.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "qconjugate",
    "qmult",
    "qnormalize",
    "qrotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "quat_from_axis_angle",
]


def qconjugate(q):
    """Quaternion conjugate: negate the vector part."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def qmult(q1, q2):
    """Hamilton product q1 ⊗ q2 on the last axis."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qnormalize(q, eps: float = 1e-8):
    """Normalize to unit norm; eps matches the reference's guard."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True) + eps
    return q / norm


def qrotate(q, v):
    """Rotate 3-vectors ``v`` by unit quaternions ``q`` (broadcasting)."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return qmult(qmult(q, qv), qconjugate(q))[..., 1:]


def quat_to_matrix(q):
    """Unit quaternion(s) -> rotation matrix(es), shape ``(..., 3, 3)``."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Normalize defensively (Shepperd-style closed form assumes unit norm).
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    m = jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def matrix_to_quat(m):
    """Rotation matrix(es) -> unit quaternion ``[w,x,y,z]`` with w >= 0.

    Branch-free variant of Shepperd's method (selects the largest of the four
    candidate denominators), safe under jit and for batches.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0 (transforms3d.mat2quat convention).
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def quat_from_axis_angle(axis, angle):
    """Unit quaternion from rotation axis (normalized internally) and angle."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle / 2.0
    w = jnp.cos(half)[..., None]
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)
