"""Dataset type enums (reference: deepclr/data/datasets/build.py:13-17)."""
from __future__ import annotations

import enum

__all__ = ["DatasetType"]


class DatasetType(enum.Enum):
    GENERIC = "generic"
    KITTI_ODOMETRY_VELODYNE = "kitti_odometry_velodyne"
    MODELNET40 = "modelnet40"

    @classmethod
    def create(cls, value) -> "DatasetType":
        if isinstance(value, cls):
            return value
        return cls(str(value).lower())
