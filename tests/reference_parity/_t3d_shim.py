"""Minimal functional ``transforms3d`` replacement for reference-parity tests.

transforms3d is not installed in this container, but the reference's
evaluation metrics (/root/reference/deepclr/evaluation/metrics.py:5) and
label conversions (/root/reference/deepclr/data/labels.py:5) need a small,
purely mathematical slice of it:

    affines.decompose / affines.compose
    euler.mat2euler / euler.euler2mat        (only axes='sxyz' is ever used)
    quaternions.mat2quat / quaternions.qmult

These are standard textbook algorithms (Gram-Schmidt TRS decomposition,
static-XYZ Euler angles, Shepperd quaternion extraction, Hamilton product)
implemented here from the math — NOT copied from the library.  Conventions
match transforms3d: quaternions are w-first with w >= 0 out of mat2quat,
and 'sxyz' means R = Rz(ak) @ Ry(aj) @ Rx(ai) (static axes, x applied
first).

The shim is float64 and exact to rounding for the rigid/near-rigid inputs
the reference feeds it; tests/reference_parity/test_eval_labels_parity.py
cross-checks it for self-consistency before any parity assertion uses it.
"""
from __future__ import annotations

import math
import sys
import types

import numpy as np

_EPS = np.finfo(np.float64).eps * 4.0


# ---------------------------------------------------------------- euler
def euler2mat(ai: float, aj: float, ak: float, axes: str = "sxyz") -> np.ndarray:
    if axes != "sxyz":
        raise NotImplementedError(f"shim only implements 'sxyz', got {axes!r}")
    ci, si = math.cos(ai), math.sin(ai)
    cj, sj = math.cos(aj), math.sin(aj)
    ck, sk = math.cos(ak), math.sin(ak)
    # static axes x, y, z applied in that order: R = Rz(ak) @ Ry(aj) @ Rx(ai)
    return np.array([
        [ck * cj, ck * sj * si - sk * ci, ck * sj * ci + sk * si],
        [sk * cj, sk * sj * si + ck * ci, sk * sj * ci - ck * si],
        [-sj, cj * si, cj * ci],
    ])


def mat2euler(mat, axes: str = "sxyz"):
    if axes != "sxyz":
        raise NotImplementedError(f"shim only implements 'sxyz', got {axes!r}")
    m = np.asarray(mat, dtype=np.float64)[:3, :3]
    cy = math.hypot(m[0, 0], m[1, 0])
    if cy > _EPS:
        ai = math.atan2(m[2, 1], m[2, 2])
        aj = math.atan2(-m[2, 0], cy)
        ak = math.atan2(m[1, 0], m[0, 0])
    else:  # cos(aj) == 0: roll and yaw are degenerate; pin yaw to 0
        ai = math.atan2(-m[1, 2], m[1, 1])
        aj = math.atan2(-m[2, 0], cy)
        ak = 0.0
    return ai, aj, ak


# -------------------------------------------------------------- affines
def decompose(a44) -> tuple:
    """A = T . R . Z . S  (translation, rotation, zooms, shears)."""
    a44 = np.asarray(a44, dtype=np.float64)
    t = a44[:3, 3].copy()
    rzs = a44[:3, :3].copy()
    # Gram-Schmidt on the columns: col0 -> sx*R0, col1 -> R span, ...
    c0, c1, c2 = rzs[:, 0].copy(), rzs[:, 1].copy(), rzs[:, 2].copy()
    sx = np.linalg.norm(c0)
    c0 /= sx
    sx_sxy = c0 @ c1
    c1 -= sx_sxy * c0
    sy = np.linalg.norm(c1)
    c1 /= sy
    sxy = sx_sxy / sx
    sx_sxz = c0 @ c2
    sy_syz = c1 @ c2
    c2 -= sx_sxz * c0 + sy_syz * c1
    sz = np.linalg.norm(c2)
    c2 /= sz
    sxz, syz = sx_sxz / sx, sy_syz / sy
    rmat = np.stack([c0, c1, c2], axis=1)
    if np.linalg.det(rmat) < 0:
        sx = -sx
        rmat[:, 0] = -rmat[:, 0]
    return t, rmat, np.array([sx, sy, sz]), np.array([sxy, sxz, syz])


def compose(t, r, z, s=None) -> np.ndarray:
    t = np.asarray(t, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    shear = np.eye(3)
    if s is not None:
        shear[0, 1], shear[0, 2], shear[1, 2] = np.asarray(s, dtype=np.float64)
    a = np.eye(4)
    a[:3, :3] = r @ np.diag(z) @ shear
    a[:3, 3] = t
    return a


# ---------------------------------------------------------- quaternions
def mat2quat(m) -> np.ndarray:
    """Rotation matrix -> unit quaternion [w, x, y, z], w >= 0 (Shepperd)."""
    m = np.asarray(m, dtype=np.float64)[:3, :3]
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2.0
        q = np.array([0.25 * s,
                      (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s,
                      (m[1, 0] - m[0, 1]) / s])
    elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
        s = math.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2.0
        q = np.array([(m[2, 1] - m[1, 2]) / s,
                      0.25 * s,
                      (m[0, 1] + m[1, 0]) / s,
                      (m[0, 2] + m[2, 0]) / s])
    elif m[1, 1] >= m[2, 2]:
        s = math.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2.0
        q = np.array([(m[0, 2] - m[2, 0]) / s,
                      (m[0, 1] + m[1, 0]) / s,
                      0.25 * s,
                      (m[1, 2] + m[2, 1]) / s])
    else:
        s = math.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2.0
        q = np.array([(m[1, 0] - m[0, 1]) / s,
                      (m[0, 2] + m[2, 0]) / s,
                      (m[1, 2] + m[2, 1]) / s,
                      0.25 * s])
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def qmult(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Hamilton product, w-first."""
    w1, x1, y1, z1 = np.asarray(q, dtype=np.float64)
    w2, x2, y2, z2 = np.asarray(r, dtype=np.float64)
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def qconjugate(q) -> np.ndarray:
    q = np.asarray(q, dtype=np.float64)
    return np.array([q[0], -q[1], -q[2], -q[3]])


def quat2mat(q) -> np.ndarray:
    w, x, y, z = np.asarray(q, dtype=np.float64)
    n = w * w + x * x + y * y + z * z
    if n < _EPS:
        return np.eye(3)
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ])


def install() -> None:
    """Register the shim as a functional ``transforms3d`` in sys.modules."""
    root = sys.modules.get("transforms3d")
    if root is None or not getattr(root, "__t3d_shim__", False):
        root = types.ModuleType("transforms3d")
        root.__path__ = []
        root.__t3d_shim__ = True
        sys.modules["transforms3d"] = root
    euler_m = types.ModuleType("transforms3d.euler")
    euler_m.euler2mat, euler_m.mat2euler = euler2mat, mat2euler
    affines_m = types.ModuleType("transforms3d.affines")
    affines_m.decompose, affines_m.compose = decompose, compose
    quat_m = types.ModuleType("transforms3d.quaternions")
    quat_m.mat2quat, quat_m.qmult, quat_m.quat2mat = mat2quat, qmult, quat2mat
    quat_m.qconjugate = qconjugate
    sys.modules["transforms3d.euler"] = euler_m
    sys.modules["transforms3d.affines"] = affines_m
    sys.modules["transforms3d.quaternions"] = quat_m
    root.euler, root.affines, root.quaternions = euler_m, affines_m, quat_m
