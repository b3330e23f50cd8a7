"""Optimizers in optax: Adam and a faithful Ranger.

The reference trains with Ranger (lessw2020's RAdam + Lookahead + gradient
centralization, cf. /root/reference/deepclr/solver/optimizers.py:1-4 and
requirements.txt).  optax has the RAdam core; lookahead and gradient
centralization are implemented here as composable GradientTransformations so
the whole optimizer stays inside the jitted train step.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["gradient_centralization", "lookahead", "ranger", "adam"]


def gradient_centralization() -> optax.GradientTransformation:
    """GC: subtract the per-output-channel gradient mean for rank>=2 params.

    For a flax kernel (in..., out) this removes the mean over all input axes,
    matching Ranger's use_gc=True behavior on conv/fc weights.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim >= 2:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    inner_state: Any
    slow_params: Any
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper keeping the slow weights inside the optimizer state.

    Unlike optax.lookahead this needs no special parameter container: every
    ``sync_period`` steps the emitted update moves the live parameters onto
    the interpolated slow weights.
    """

    def init_fn(params):
        # copy=True: the slow weights must not alias the live parameters —
        # both live in the (donated) train state and XLA forbids donating
        # the same buffer twice.
        return LookaheadState(
            inner_state=inner.init(params),
            slow_params=jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), params
            ),
            count=jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        inner_updates, inner_state = inner.update(updates, state.inner_state, params)
        fast = jax.tree_util.tree_map(lambda p, u: p + u, params, inner_updates)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def interp(s, f):
            return s + slow_step_size * (f - s)

        slow_next = jax.tree_util.tree_map(interp, state.slow_params, fast)
        # On sync steps, jump to the slow weights; otherwise keep the fast step.
        new_target = jax.tree_util.tree_map(
            lambda sn, f: jnp.where(sync, sn, f), slow_next, fast
        )
        new_slow = jax.tree_util.tree_map(
            lambda sn, s: jnp.where(sync, sn, s), slow_next, state.slow_params
        )
        final_updates = jax.tree_util.tree_map(
            lambda t, p: t - p, new_target, params
        )
        return final_updates, LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init_fn, update_fn)


def _wd_mask(params):
    """Weight decay only on rank>=2 kernels (the reference exempts biases via
    the 'bias' name check, solver/build.py:17-19; rank covers BN scales and
    learned loss weights too)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def ranger(learning_rate: float, weight_decay: float = 0.0,
           b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
           sync_period: int = 6, slow_step_size: float = 0.5,
           threshold: float = 5.0, use_gc: bool = True,
           **_ignored) -> optax.GradientTransformation:
    """Ranger = GC -> RAdam -> decoupled weight decay -> lr -> Lookahead."""
    parts = []
    if use_gc:
        parts.append(gradient_centralization())
    parts.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps, threshold=threshold))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=_wd_mask))
    parts.append(optax.scale(-learning_rate))
    return lookahead(optax.chain(*parts), sync_period, slow_step_size)


def adam(learning_rate: float, weight_decay: float = 0.0,
         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
         **_ignored) -> optax.GradientTransformation:
    """torch-style Adam: L2 weight decay folded into the gradient."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=_wd_mask))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)
