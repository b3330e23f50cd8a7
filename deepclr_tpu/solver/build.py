"""Optimizer / schedule factories from config (reference solver/build.py).

The optimizer is built with optax.inject_hyperparams so the learning rate is
a mutable field of the optimizer state: the (host-side) schedule value is
written into the state inside the jitted train step each iteration, which
supports per-iteration, per-epoch, and per-validation stepping uniformly.
"""
from __future__ import annotations

import optax

from . import optimizers
from .schedulers import Schedule, make_schedule_fn

__all__ = ["make_optimizer", "make_schedule"]

_OPTIMIZERS = {
    "Ranger": optimizers.ranger,
    "Adam": optimizers.adam,
}


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Create the optimizer from cfg.optimizer.

    Note on bias_lr_factor: the reference nominally doubles the bias lr, but
    with any on_iteration scheduler (all shipped configs) torch's scheduler
    overwrites every param group's lr each step, so the factor never takes
    effect in practice; we therefore use a single lr and decay-mask biases.
    """
    name = cfg.optimizer.name
    if name not in _OPTIMIZERS:
        raise NotImplementedError(f"Unknown optimizer '{name}'")
    factory = _OPTIMIZERS[name]
    extra = dict(cfg.optimizer.params or {})

    def make(learning_rate):
        return factory(
            learning_rate=learning_rate,
            weight_decay=cfg.optimizer.weight_decay,
            **extra,
        )

    return optax.inject_hyperparams(make)(learning_rate=cfg.optimizer.base_lr)


def make_schedule(cfg) -> Schedule:
    """Create the step->lr schedule from cfg.scheduler."""
    return make_schedule_fn(
        cfg.scheduler.name, dict(cfg.scheduler.params or {}), cfg.optimizer.base_lr
    )
