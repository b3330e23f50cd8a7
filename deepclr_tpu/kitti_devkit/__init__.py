"""KITTI odometry benchmark evaluation (native C++ backend).

API parity with the reference's ``kitti_devkit`` module
(extern/kitti_devkit/kitti_devkit/__init__.py): ``eval(gt_dir, pred_dir)``
and a module CLI ``python -m deepclr_tpu.kitti_devkit GT_DIR PRED_DIR``.
"""
from ..native import kitti_devkit_eval as eval  # noqa: A001 (reference name)

__all__ = ["eval"]
