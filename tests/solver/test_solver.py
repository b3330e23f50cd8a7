"""Optimizer / schedule tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepclr_tpu.solver import gradient_centralization, lookahead, ranger
from deepclr_tpu.solver.optimizers import adam
from deepclr_tpu.solver.schedulers import cyclic_flat_cosine, cyclic_lr


def test_cyclic_lr_boundaries():
    sched = cyclic_lr(base_lr=0.1, max_lr=1.0, step_size_up=10)
    assert sched(0) == pytest.approx(0.1)
    assert sched(10) == pytest.approx(1.0)
    assert sched(20) == pytest.approx(0.1)
    assert sched(5) == pytest.approx(0.55)
    assert sched(15) == pytest.approx(0.55)
    # next cycle identical (triangular)
    assert sched(25) == pytest.approx(sched(5))


def test_cyclic_flat_cosine_phases():
    sched = cyclic_flat_cosine(
        cyclic_iterations=100, flat_iterations=50, annealing_iterations=50,
        base_lr=0.01, max_lr=0.1, step_size_up=10,
    )
    assert sched(0) == pytest.approx(0.01)
    assert sched(10) == pytest.approx(0.1)
    # flat phase at base_lr
    for t in (100, 120, 149):
        assert sched(t) == pytest.approx(0.01)
    # cosine from base_lr to 0
    assert sched(150) == pytest.approx(0.01)
    assert sched(175) == pytest.approx(0.005)
    assert sched(200) == pytest.approx(0.0)
    assert sched(10_000) == 0.0


def test_gradient_centralization():
    gc = gradient_centralization()
    params = {"kernel": jnp.ones((4, 3)), "bias": jnp.ones((3,))}
    state = gc.init(params)
    grads = {
        "kernel": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
        "bias": jnp.arange(3, dtype=jnp.float32),
    }
    out, _ = gc.update(grads, state)
    # kernel columns have zero mean; bias untouched
    np.testing.assert_allclose(np.asarray(out["kernel"]).mean(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bias"]), np.arange(3), atol=1e-6)


def test_lookahead_sync_jumps_to_slow():
    inner = optax.sgd(0.1)
    opt = lookahead(inner, sync_period=2, slow_step_size=0.5)
    params = jnp.asarray([1.0])
    state = opt.init(params)
    grads = jnp.asarray([1.0])

    # step 1 (no sync): plain sgd step
    u1, state = opt.update(grads, state, params)
    p1 = params + u1
    np.testing.assert_allclose(np.asarray(p1), [0.9], atol=1e-6)

    # step 2 (sync): fast would be 0.8; slow = 1.0 + 0.5*(0.8-1.0) = 0.9
    u2, state = opt.update(grads, state, p1)
    p2 = p1 + u2
    np.testing.assert_allclose(np.asarray(p2), [0.9], atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.slow_params), [0.9], atol=1e-6)


@pytest.mark.parametrize("make_opt", [ranger, adam])
def test_optimizers_converge_on_quadratic(make_opt):
    opt = make_opt(learning_rate=0.05)
    target = jnp.asarray([3.0, -2.0, 0.5])
    params = jnp.zeros(3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p - target) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(2000):
        params, state = step(params, state)
    np.testing.assert_allclose(np.asarray(params), np.asarray(target), atol=1e-2)


def test_make_optimizer_from_config_with_injected_lr():
    from deepclr_tpu.config import Config
    from deepclr_tpu.solver import make_optimizer, make_schedule

    cfg = Config(allow_dynamic_params=True)
    o = cfg.define_group("optimizer")
    cfg.define_param("name", parent=o, default="Ranger")
    cfg.define_param("base_lr", parent=o, default=0.01)
    cfg.define_param("weight_decay", parent=o, default=0.001)
    cfg.define_param("params", parent=o, default={})
    s = cfg.define_group("scheduler")
    cfg.define_param("name", parent=s, default=None)
    cfg.define_param("params", parent=s, default={})

    opt = make_optimizer(cfg)
    sched = make_schedule(cfg)
    assert sched(123) == 0.01

    params = {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    # override lr through the injected hyperparams (as the train step does);
    # check on the bias (GC legitimately zeroes a constant kernel gradient)
    state.hyperparams["learning_rate"] = jnp.asarray(0.5)
    updates, state = opt.update(grads, state, params)
    assert float(jnp.max(jnp.abs(updates["bias"]))) > 0.05  # lr actually 0.5
