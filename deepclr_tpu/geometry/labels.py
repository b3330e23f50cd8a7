"""Pose label parameterizations.

Mirrors the label contract of the reference framework
(/root/reference/deepclr/data/labels.py:10-101): three interchangeable
parameterizations of a rigid transform with identity-bias values used to
initialize the regression head.  Conversions are jax-native and batched
(leading axes broadcast), and also accept plain numpy arrays on host.
"""
from __future__ import annotations

import enum
from typing import List, Optional

import jax.numpy as jnp

from . import quaternion as quat
from . import se3


class LabelType(enum.Enum):
    """Available label types and their transform parameterizations."""

    POSE3D_EULER = "pose3d_euler"
    POSE3D_QUAT = "pose3d_quat"
    POSE3D_DUAL_QUAT = "pose3d_dual_quat"

    @classmethod
    def create(cls, value) -> "LabelType":
        if isinstance(value, cls):
            return value
        return cls(str(value).lower())

    @property
    def dim(self) -> int:
        return {
            LabelType.POSE3D_EULER: 6,
            LabelType.POSE3D_QUAT: 7,
            LabelType.POSE3D_DUAL_QUAT: 8,
        }[self]

    @property
    def names(self) -> List[str]:
        if self == LabelType.POSE3D_EULER:
            return ["x", "y", "z", "roll", "pitch", "yaw"]
        if self == LabelType.POSE3D_QUAT:
            return ["pos_x", "pos_y", "pos_z", "rot_w", "rot_x", "rot_y", "rot_z"]
        return [
            "real_w", "real_x", "real_y", "real_z",
            "dual_w", "dual_x", "dual_y", "dual_z",
        ]

    @property
    def bias(self) -> Optional[List[float]]:
        """Head-bias values so an untrained model predicts identity."""
        if self == LabelType.POSE3D_EULER:
            return None
        if self == LabelType.POSE3D_QUAT:
            return [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
        return [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]

    def from_matrix(self, m, scale: Optional[float] = None):
        """(..., 4, 4) transform -> (..., dim) label (Euler angles in deg)."""
        m = jnp.asarray(m)
        if self == LabelType.POSE3D_EULER:
            t = m[..., :3, 3]
            roll, pitch, yaw = se3.matrix_to_euler(m[..., :3, :3])
            label = jnp.concatenate(
                [t, jnp.stack([jnp.rad2deg(roll), jnp.rad2deg(pitch), jnp.rad2deg(yaw)], axis=-1)],
                axis=-1,
            )
        elif self == LabelType.POSE3D_QUAT:
            t = m[..., :3, 3]
            q = quat.matrix_to_quat(m[..., :3, :3])
            label = jnp.concatenate([t, q], axis=-1)
        elif self == LabelType.POSE3D_DUAL_QUAT:
            label = se3.dualquat_from_matrix(m)
        else:  # pragma: no cover
            raise NotImplementedError(self)
        if scale is not None:
            label = label * scale
        return label

    def to_matrix(self, label, scale: Optional[float] = None):
        """(..., dim) label -> (..., 4, 4) transform."""
        label = jnp.asarray(label)
        if scale is not None:
            label = label / scale

        if self == LabelType.POSE3D_EULER:
            t = label[..., :3]
            r = se3.euler_to_matrix(
                jnp.deg2rad(label[..., 3]),
                jnp.deg2rad(label[..., 4]),
                jnp.deg2rad(label[..., 5]),
            )
            return se3.make_transform(r, t)
        if self == LabelType.POSE3D_QUAT:
            t = label[..., :3]
            r = quat.quat_to_matrix(quat.qnormalize(label[..., 3:]))
            return se3.make_transform(r, t)
        if self == LabelType.POSE3D_DUAL_QUAT:
            return se3.dualquat_to_matrix(label)
        raise NotImplementedError(self)  # pragma: no cover
