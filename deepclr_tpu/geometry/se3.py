"""SE(3) helpers: 4x4 transforms, Euler angles, dual quaternions.

Replaces the reference's transforms3d usage (compose/decompose/euler —
/root/reference/deepclr/data/labels.py:53-101) with jax-native batched math.
Euler convention is static XYZ ('sxyz'): R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import quaternion as quat

__all__ = [
    "make_transform",
    "transform_inverse",
    "transform_points",
    "euler_to_matrix",
    "matrix_to_euler",
    "dualquat_from_matrix",
    "dualquat_to_matrix",
    "dualquat_normalize",
    "dualquat_translation",
]


def make_transform(rotation, translation):
    """Assemble (..., 4, 4) homogeneous transforms from R (...,3,3), t (...,3)."""
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    rotation = jnp.broadcast_to(rotation, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    top = jnp.concatenate([rotation, translation[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_inverse(m):
    """Inverse of rigid transform(s) without a general solve."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    r_inv = jnp.swapaxes(r, -1, -2)
    # precision='highest': jax's default matmul precision truncates to bf16,
    # which is unacceptable for pose math.
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t, precision="highest")
    return make_transform(r_inv, t_inv)


def transform_points(m, pts):
    """Apply (..., 4, 4) transforms to (..., N, 3) points."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rotated = jnp.einsum("...ij,...nj->...ni", r, pts, precision="highest")
    return rotated + t[..., None, :]


def euler_to_matrix(roll, pitch, yaw):
    """Static-XYZ ('sxyz') Euler angles [rad] -> rotation matrix."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_euler(m):
    """Rotation matrix -> static-XYZ Euler (roll, pitch, yaw) [rad]."""
    r20 = jnp.clip(m[..., 2, 0], -1.0, 1.0)
    pitch = -jnp.arcsin(r20)
    # Gimbal-lock guard: |cos(pitch)| ~ 0.
    cp = jnp.cos(pitch)
    safe = jnp.abs(cp) > 1e-6
    roll = jnp.where(
        safe,
        jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
        jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]),
    )
    yaw = jnp.where(safe, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]), 0.0)
    return roll, pitch, yaw


# --- dual quaternions -------------------------------------------------------
# A rigid transform (R, t) maps to (q_r, q_d) with q_r = quat(R) and
# q_d = 0.5 * (0, t) ⊗ q_r; recovery: t = 2 * q_d ⊗ q_r*.
# Matches /root/reference/deepclr/data/labels.py:64-99 semantics.


def dualquat_from_matrix(m):
    """(..., 4, 4) -> (..., 8) dual quaternion [real(4), dual(4)]."""
    real = quat.matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    tq = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    dual = 0.5 * quat.qmult(tq, real)
    return jnp.concatenate([real, dual], axis=-1)


def dualquat_normalize(dq, eps: float = 1e-8):
    """Divide both parts by the real norm (reference _dqnormalize)."""
    norm = jnp.linalg.norm(dq[..., :4], axis=-1, keepdims=True) + eps
    return dq / norm


def dualquat_translation(dq):
    """Translation vector encoded by a (normalized) dual quaternion."""
    t = 2.0 * quat.qmult(dq[..., 4:], quat.qconjugate(dq[..., :4]))
    return t[..., 1:]


def dualquat_to_matrix(dq, eps: float = 1e-8):
    """(..., 8) dual quaternion -> (..., 4, 4), normalizing the real part."""
    dq = dualquat_normalize(dq, eps)
    r = quat.quat_to_matrix(dq[..., :4])
    t = dualquat_translation(dq)
    return make_transform(r, t)
