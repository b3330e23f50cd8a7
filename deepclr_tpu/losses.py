"""Label-space loss and metric functions.

jax-native ports of the reference's loss contracts
(/root/reference/deepclr/utils/metrics.py:28-262): translation / rotation /
dual-quaternion losses per LabelType, composable into a weighted sum from the
config's metric list.  All functions take ``(source, target)`` batches of
labels ``(B, dim)`` and a reduction in {'none', 'mean', 'sum'}.
"""
from __future__ import annotations

import enum
from typing import Any, Callable, Dict, Optional, Sequence

import jax.numpy as jnp

from .geometry import LabelType
from .geometry import quaternion as quat

__all__ = [
    "MetricType",
    "trans_loss",
    "trans_3d_loss",
    "dual_loss",
    "rot_loss",
    "quat_norm_loss",
    "dual_constraint_loss",
    "make_loss_fn",
    "make_metric_fns",
]

MetricFunction = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _reduce(x, reduction: Optional[str]):
    if reduction is None or reduction == "none":
        return x
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise RuntimeError(f"Unsupported reduction '{reduction}'")


def _normalize(x, label_type: LabelType, eps: float = 1e-8):
    if label_type == LabelType.POSE3D_QUAT:
        norm = jnp.linalg.norm(x[:, 3:], axis=1, keepdims=True) + eps
        return jnp.concatenate([x[:, :3], x[:, 3:] / norm], axis=1)
    if label_type == LabelType.POSE3D_DUAL_QUAT:
        norm = jnp.linalg.norm(x[:, :4], axis=1, keepdims=True) + eps
        return x / norm
    raise RuntimeError("Unsupported label type for normalization")


def _pnorm(x, p: int):
    if p == 1:
        return jnp.sum(jnp.abs(x), axis=1, keepdims=True)
    if p == 2:
        return jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-20)
    return jnp.sum(jnp.abs(x) ** p, axis=1, keepdims=True) ** (1.0 / p)


def trans_loss(source, target, label_type: LabelType, p: int = 2,
               reduction: Optional[str] = "mean", eps: float = 1e-8):
    """Translation-component loss (dual part for dual quaternions)."""
    if label_type in (LabelType.POSE3D_EULER, LabelType.POSE3D_QUAT):
        s, t = source[:, :3], target[:, :3]
    elif label_type == LabelType.POSE3D_DUAL_QUAT:
        s = _normalize(source, label_type, eps)[:, 4:]
        t = _normalize(target, label_type, eps)[:, 4:]
    else:
        raise RuntimeError("Unsupported label type for this loss type.")
    return _reduce(_pnorm(s - t, p), reduction)


def trans_3d_loss(source, target, label_type: LabelType, p: int = 2,
                  reduction: Optional[str] = "mean", eps: float = 1e-8):
    """Translation loss in metric xyz coordinates."""
    if label_type in (LabelType.POSE3D_EULER, LabelType.POSE3D_QUAT):
        s, t = source[:, :3], target[:, :3]
    elif label_type == LabelType.POSE3D_DUAL_QUAT:
        sn = _normalize(source, label_type, eps)
        tn = _normalize(target, label_type, eps)
        s = 2.0 * quat.qmult(sn[:, 4:], quat.qconjugate(sn[:, :4]))[:, 1:]
        t = 2.0 * quat.qmult(tn[:, 4:], quat.qconjugate(tn[:, :4]))[:, 1:]
    else:
        raise RuntimeError("Unsupported label type for this loss type.")
    return _reduce(_pnorm(s - t, p), reduction)


def dual_loss(source, target, label_type: LabelType, p: int = 2,
              reduction: Optional[str] = "mean", eps: float = 1e-8):
    """Dual-quaternion dual-part loss."""
    if label_type == LabelType.POSE3D_QUAT:
        zeros = jnp.zeros_like(source[:, :1])
        stq = jnp.concatenate([zeros, source[:, :3]], axis=1)
        ttq = jnp.concatenate([zeros, target[:, :3]], axis=1)
        s = 0.5 * quat.qmult(stq, source[:, 3:])
        t = 0.5 * quat.qmult(ttq, target[:, 3:])
    elif label_type == LabelType.POSE3D_DUAL_QUAT:
        s = _normalize(source, label_type, eps)[:, 4:]
        t = _normalize(target, label_type, eps)[:, 4:]
    else:
        raise RuntimeError("Unsupported label type for this loss type")
    return _reduce(_pnorm(s - t, p), reduction)


def rot_loss(source, target, label_type: LabelType, p: int = 2,
             reduction: Optional[str] = "mean", eps: float = 1e-8):
    """Rotation-component loss (euler angles / quaternion / real part)."""
    if label_type == LabelType.POSE3D_EULER:
        s, t = source[:, 3:], target[:, 3:]
    elif label_type == LabelType.POSE3D_QUAT:
        s = _normalize(source, label_type, eps)[:, 3:]
        t = _normalize(target, label_type, eps)[:, 3:]
    elif label_type == LabelType.POSE3D_DUAL_QUAT:
        s = _normalize(source, label_type, eps)[:, :4]
        t = _normalize(target, label_type, eps)[:, :4]
    else:
        raise RuntimeError("Unsupported label type for this loss type")
    return _reduce(_pnorm(s - t, p), reduction)


def quat_norm_loss(source, _target, label_type: LabelType,
                   reduction: Optional[str] = "mean"):
    """(1 - ||q||)² regularizer on the (real) quaternion norm."""
    if label_type == LabelType.POSE3D_QUAT:
        norm = jnp.linalg.norm(source[:, 3:], axis=1, keepdims=True)
    elif label_type == LabelType.POSE3D_DUAL_QUAT:
        norm = jnp.linalg.norm(source[:, :4], axis=1, keepdims=True)
    else:
        raise RuntimeError("Unsupported label type for this loss type.")
    return _reduce((1.0 - norm) ** 2, reduction)


def dual_constraint_loss(source, _target, label_type: LabelType,
                         reduction: Optional[str] = "mean", eps: float = 1e-8):
    """Penalty on the scalar part of the recovered translation quaternion."""
    if label_type != LabelType.POSE3D_DUAL_QUAT:
        raise RuntimeError("Unsupported label type for this loss type.")
    s = _normalize(source, label_type, eps)
    tq = 2.0 * quat.qmult(s[:, 4:], quat.qconjugate(s[:, :4]))
    return _reduce(tq[:, :1] ** 2, reduction)


class MetricType(enum.Enum):
    """All composable loss / metric kinds (reference MetricType parity)."""

    MAE = "mae"
    MSE = "mse"
    TRANS = "trans"
    TRANS_3D = "trans_3d"
    DUAL = "dual"
    ROT = "rot"
    QUAT_NORM = "quat_norm"
    DUAL_CONSTRAINT = "dual_constraint"

    @classmethod
    def create(cls, value) -> "MetricType":
        if isinstance(value, cls):
            return value
        return cls(str(value).lower())

    def fn(self, label_type: LabelType,
           weights: Optional[Sequence[float]] = None,
           **kwargs: Any) -> MetricFunction:
        def generic(source, target, reduction):
            if self == MetricType.MAE:
                return _reduce(jnp.abs(source - target), reduction)
            if self == MetricType.MSE:
                return _reduce((source - target) ** 2, reduction)
            if self == MetricType.TRANS:
                return trans_loss(source, target, label_type, reduction=reduction, **kwargs)
            if self == MetricType.TRANS_3D:
                return trans_3d_loss(source, target, label_type, reduction=reduction, **kwargs)
            if self == MetricType.DUAL:
                return dual_loss(source, target, label_type, reduction=reduction, **kwargs)
            if self == MetricType.ROT:
                return rot_loss(source, target, label_type, reduction=reduction, **kwargs)
            if self == MetricType.QUAT_NORM:
                return quat_norm_loss(source, target, label_type, reduction=reduction)
            if self == MetricType.DUAL_CONSTRAINT:
                return dual_constraint_loss(source, target, label_type, reduction=reduction)
            raise NotImplementedError(self)  # pragma: no cover

        if weights is None:
            return lambda s, t: generic(s, t, "mean")
        w = jnp.asarray(weights, jnp.float32)
        return lambda s, t: jnp.sum(w * jnp.mean(generic(s, t, "none"), axis=0))


def make_loss_fn(loss_cfgs: Sequence[Dict], label_type: LabelType) -> MetricFunction:
    """Weighted-sum loss from a config metric list.

    Each entry: {'type': str|MetricType, 'weights': [..], 'params': {..}}.
    """
    fns = []
    for m in loss_cfgs:
        weights = m.get("weights", [1.0])
        params = m.get("params", {}) or {}
        fns.append(MetricType.create(m["type"]).fn(label_type, weights=weights, **params))

    def loss_fn(source, target):
        return sum(f(source, target) for f in fns)

    return loss_fn


def make_metric_fns(loss_cfgs: Sequence[Dict], other_cfgs: Sequence[Dict],
                    label_type: LabelType) -> Dict[str, MetricFunction]:
    """Named unweighted metric functions for logging (reference get_metric_fns)."""
    out: Dict[str, MetricFunction] = {}
    for m in [*loss_cfgs, *other_cfgs]:
        params = m.get("params", {}) or {}
        mt = MetricType.create(m["type"])
        out[mt.value] = mt.fn(label_type, **params)
    return out
