"""Engine tests: overfit a synthetic batch end-to-end, checkpoint round trip,
gradient accumulation, and data-parallel execution on the 8-device CPU mesh."""
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepclr_tpu.config import Mode, create_default_config, finish_config
from deepclr_tpu.engine import run_trainer
from deepclr_tpu.geometry import LabelType, se3
from deepclr_tpu.losses import make_loss_fn, make_metric_fns
from deepclr_tpu.models import build_model, init_params
from deepclr_tpu.solver import make_optimizer, make_schedule

B, N = 4, 256

MODEL_PARAMS = {
    "batch_norm": False,
    "dropout": 1.0,
    "cloud_features": {
        "name": "SetAbstraction",
        "params": {
            "npoint": [64],
            "radii": [[0.5, 1.0]],
            "nsamples": [[16, 32]],
            "mlps": [[[8, 8, 16], [8, 8, 16]]],
        },
    },
    "merge": {
        "name": "MotionEmbedding",
        "params": {"k": 8, "radius": 10.0, "mlp": [32, 32, 64]},
    },
    "output": {
        "name": "OutputSimple",
        "params": {"mlp": [64, 128], "linear": [128, 64]},
    },
}


def _make_cfg(tmp_path, batch_size=B, max_iterations=60, accumulation=1):
    cfg = create_default_config(Mode.TEST)
    cfg.read_dict({
        "base_dir": str(tmp_path),
        "data": {"sequential": False},
        "data_loader": {"batch_size": batch_size, "num_points": N},
        "model": {
            "input_dim": 3,
            "point_dim": 3,
            "label_type": "pose3d_dual_quat",
            "model_type": "deepclr",
            "params": MODEL_PARAMS,
        },
        "metrics": {
            "loss": [
                {"type": "trans", "weights": [1.0], "params": {"p": 2}},
                {"type": "rot", "weights": [200.0], "params": {"p": 2}},
            ],
            "other": [{"type": "quat_norm"}],
        },
        "optimizer": {
            "name": "Adam",
            "base_lr": 0.002,
            "max_iterations": max_iterations,
            "accumulation_steps": accumulation,
        },
        "scheduler": {"on_iteration": True},
        "logging": {
            "log_period": 20,
            "summary_period": 10,
            "checkpoint_period": 1000,
            "validation_period": 1000,
        },
    })
    finish_config(cfg)
    cfg.defrost()
    cfg.output_dir = str(tmp_path / "out")
    cfg.freeze()
    return cfg


def _synthetic_batch(seed=0, batch=B):
    """Template cloud + rigidly transformed source with the exact dual-quat label."""
    rng = np.random.default_rng(seed)
    template = rng.normal(size=(batch, N, 3)).astype(np.float32) * 3.0

    yaw = np.deg2rad(3.0)
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = [0.5, -0.2, 0.1]
    m_batch = np.tile(m[None], (batch, 1, 1))

    # source = motion applied to template (so gt transform aligns them)
    source = np.asarray(se3.transform_points(jnp.asarray(m_batch), template))
    y = np.asarray(LabelType.POSE3D_DUAL_QUAT.from_matrix(m_batch)).astype(np.float32)

    eye = np.tile(np.eye(4, dtype=np.float32)[None], (batch, 1, 1))
    return {
        "template": template,
        "source": source.astype(np.float32),
        "template_mask": np.ones((batch, N), bool),
        "source_mask": np.ones((batch, N), bool),
        "aug_template": eye,
        "aug_source": eye,
        "y": y,
        "d": ["seq"] * batch,
        "t": np.arange(batch, dtype=np.float64),
    }


class ListLoader(list):
    """Minimal loader: any sized list of batch dicts."""


@pytest.fixture(scope="module")
def overfit_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("engine")
    cfg = _make_cfg(tmp_path, max_iterations=150)
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=B)
    optimizer = make_optimizer(cfg)
    schedule = make_schedule(cfg)
    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)
    metric_fns = make_metric_fns(cfg.metrics.loss, cfg.metrics.other, cfg.model.label_type)

    batch = _synthetic_batch()
    loader = ListLoader([batch] * 10)
    val_loader = ListLoader([batch])

    # initial loss for comparison
    y_pred0, _ = model.apply(variables, batch["template"], batch["source"])
    loss0 = float(loss_fn(y_pred0, batch["y"]))

    state = run_trainer(cfg, model, variables, loader, val_loader, optimizer,
                        schedule, loss_fn, metric_fns)
    return cfg, model, state, batch, loss0, loss_fn


def test_overfit_single_batch(overfit_run):
    cfg, model, state, batch, loss0, loss_fn = overfit_run
    y_pred, _ = model.apply({"params": jax.device_get(state.params)},
                            batch["template"], batch["source"])
    loss1 = float(loss_fn(y_pred, batch["y"]))
    assert loss1 < loss0 * 0.5, f"loss did not drop: {loss0} -> {loss1}"

    # predicted transform approaches ground truth
    m_pred = np.asarray(LabelType.POSE3D_DUAL_QUAT.to_matrix(y_pred))
    m_gt = np.asarray(LabelType.POSE3D_DUAL_QUAT.to_matrix(batch["y"]))
    t_err = np.linalg.norm(m_pred[:, :3, 3] - m_gt[:, :3, 3], axis=1)
    assert t_err.mean() < 0.4


def test_checkpoints_written(overfit_run):
    cfg, *_ = overfit_run
    out = cfg.output_dir
    assert osp.exists(osp.join(out, "config.yaml"))
    assert osp.exists(osp.join(out, "model_config.yaml"))
    assert osp.exists(osp.join(out, "models", "deepclr.py"))
    assert osp.islink(osp.join(out, "ckpt.msgpack"))
    assert osp.islink(osp.join(out, "weights.msgpack"))
    assert osp.exists(osp.join(out, "scalars.jsonl"))


def test_checkpoint_restore_round_trip(overfit_run, tmp_path):
    cfg, model, state, batch, _, _ = overfit_run
    from deepclr_tpu.engine import Checkpointer, restore_checkpoint
    from deepclr_tpu.engine.trainer import create_train_state
    from deepclr_tpu.models import init_params as ip

    host_state = jax.device_get(state)
    ck = Checkpointer(str(tmp_path), n_saved=2)
    ck.save_checkpoint(3, 150, host_state, host_state.params)

    # template must be a freshly-built state
    variables = ip(model, jax.random.PRNGKey(1), num_points=N, batch_size=B)
    optimizer = make_optimizer(cfg)
    template = create_train_state(
        model, variables, optimizer,
        metric_names=list(host_state.metrics_ema.keys()), seed=0,
    )
    restored = restore_checkpoint(str(tmp_path / "ckpt.msgpack"), jax.device_get(template))
    assert restored["epoch"] == 3 and restored["iteration"] == 150
    leaves_a = jax.tree_util.tree_leaves(host_state.params)
    leaves_b = jax.tree_util.tree_leaves(restored["state"].params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpointer_ring_buffer(tmp_path):
    from deepclr_tpu.engine import Checkpointer

    ck = Checkpointer(str(tmp_path), n_saved=2)
    state = {"w": np.ones(3)}
    for it in (10, 20, 30):
        ck.save_checkpoint(0, it, state, state)
    import os

    files = sorted(os.listdir(tmp_path))
    assert "ckpt_10.msgpack" not in files
    assert "ckpt_20.msgpack" in files and "ckpt_30.msgpack" in files
    # symlink points to latest
    assert osp.realpath(osp.join(tmp_path, "ckpt.msgpack")).endswith("ckpt_30.msgpack")


def test_gradient_accumulation_matches_large_batch(tmp_path):
    """accum=2 on half batches == accum=1 on the full batch (one update)."""
    from deepclr_tpu.engine import create_train_state, make_train_step

    cfg = _make_cfg(tmp_path, accumulation=1)
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=B)
    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)

    full = _synthetic_batch(seed=5, batch=4)
    half1 = {k: (v[:2] if isinstance(v, np.ndarray) else v) for k, v in full.items()}
    half2 = {k: (v[2:] if isinstance(v, np.ndarray) else v) for k, v in full.items()}

    def arrays(b):
        return {k: v for k, v in b.items() if isinstance(v, np.ndarray)}

    optimizer = make_optimizer(cfg)

    step_full = make_train_step(model, optimizer, loss_fn, {}, accumulation_steps=1)
    s0 = create_train_state(model, variables, optimizer, ["loss", "loss_fn"])
    s_full, _ = step_full(s0, arrays(full), np.float32(0.01))

    step_acc = make_train_step(model, optimizer, loss_fn, {}, accumulation_steps=2)
    s1 = create_train_state(model, variables, optimizer, ["loss", "loss_fn"])
    s1, _ = step_acc(s1, arrays(half1), np.float32(0.01))
    s1, _ = step_acc(s1, arrays(half2), np.float32(0.01))

    a = jax.tree_util.tree_leaves(s_full.params)
    b = jax.tree_util.tree_leaves(s1.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4)


def test_train_step_on_8_device_mesh(tmp_path):
    """The jitted step runs data-parallel over the virtual 8-device CPU mesh."""
    from deepclr_tpu.engine import create_train_state, make_train_step
    from deepclr_tpu.parallel import make_mesh, replicate_sharding, shard_batch

    assert jax.device_count() == 8

    cfg = _make_cfg(tmp_path, batch_size=8)
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=8)
    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)
    optimizer = make_optimizer(cfg)

    mesh = make_mesh()
    state = create_train_state(model, variables, optimizer, ["loss", "loss_fn"])
    state = jax.device_put(state, replicate_sharding(mesh))

    batch = _synthetic_batch(seed=7, batch=8)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    dev = shard_batch(arrays, mesh)

    step = make_train_step(model, optimizer, loss_fn, {})
    state, metrics = step(state, dev, np.float32(0.001))
    state, metrics = step(state, dev, np.float32(0.001))
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.sharding.is_fully_replicated


def test_eval_step_on_8_device_mesh(tmp_path):
    """The jitted eval step runs data-parallel on the 8-device CPU mesh:
    sharded batch in, per-pair predictions out, finite global metrics —
    the validation analog of test_train_step_on_8_device_mesh."""
    from deepclr_tpu.engine import create_train_state, make_eval_step
    from deepclr_tpu.losses import make_metric_fns
    from deepclr_tpu.parallel import make_mesh, replicate_sharding, shard_batch

    assert jax.device_count() == 8

    cfg = _make_cfg(tmp_path, batch_size=8)
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=8)
    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)
    metric_fns = make_metric_fns(cfg.metrics.loss, [], cfg.model.label_type)
    optimizer = make_optimizer(cfg)

    mesh = make_mesh()
    state = create_train_state(model, variables, optimizer, ["loss"])
    state = jax.device_put(state, replicate_sharding(mesh))

    batch = _synthetic_batch(seed=11, batch=8)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    dev = shard_batch(arrays, mesh)

    eval_step = make_eval_step(model, {**metric_fns, "loss_fn": loss_fn})
    y_pred, metrics = eval_step(state, dev)
    assert y_pred.shape[0] == 8
    for name, v in metrics.items():
        assert np.isfinite(float(np.mean(np.asarray(v)))), name
    # a second call hits the same executable (no shape-driven recompile)
    y_pred2, _ = eval_step(state, dev)
    np.testing.assert_allclose(np.asarray(y_pred), np.asarray(y_pred2))


def test_weight_ema_tracks_updates(tmp_path):
    """param_ema follows ema <- d*ema + (1-d)*params, moving only on real
    optimizer updates (every accumulation_steps micro-steps)."""
    from deepclr_tpu.engine import create_train_state, make_train_step

    decay = 0.5
    cfg = _make_cfg(tmp_path, accumulation=2)
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=B)
    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)
    optimizer = make_optimizer(cfg)

    step = make_train_step(model, optimizer, loss_fn, {},
                           accumulation_steps=2, weight_ema_decay=decay)
    state = create_train_state(model, variables, optimizer,
                               ["loss", "loss_fn"], weight_ema=True)
    p0 = jax.device_get(state.params)

    batch = {k: v for k, v in _synthetic_batch(seed=3).items()
             if isinstance(v, np.ndarray)}

    expected = p0
    for i in range(4):
        state, _ = step(state, batch, np.float32(0.01))
        params_i = jax.device_get(state.params)
        if (i + 1) % 2 == 0:  # optimizer update fired
            expected = jax.tree_util.tree_map(
                lambda e, p: e * decay + (1 - decay) * p, expected, params_i
            )
        else:  # accumulation-only micro-step: ema must not move
            for a, b in zip(jax.tree_util.tree_leaves(expected),
                            jax.tree_util.tree_leaves(
                                jax.device_get(state.param_ema))):
                np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(jax.device_get(state.param_ema))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # the average lags the raw params (they moved away from init)
    d_params = sum(float(np.abs(x - y).sum()) for x, y in zip(
        jax.tree_util.tree_leaves(p0),
        jax.tree_util.tree_leaves(jax.device_get(state.params))))
    d_ema = sum(float(np.abs(x - y).sum()) for x, y in zip(
        jax.tree_util.tree_leaves(p0),
        jax.tree_util.tree_leaves(jax.device_get(state.param_ema))))
    assert 0.0 < d_ema < d_params


def test_weight_ema_trainer_artifacts(tmp_path):
    """run_trainer with optimizer.weight_ema_decay writes weights_ema_*
    artifacts loadable for inference."""
    from deepclr_tpu.models import load_weights

    cfg = _make_cfg(tmp_path, max_iterations=4)
    cfg.defrost()
    cfg.optimizer.weight_ema_decay = 0.9
    cfg.freeze()
    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N, batch_size=B)
    optimizer = make_optimizer(cfg)
    schedule = make_schedule(cfg)
    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)
    metric_fns = make_metric_fns(cfg.metrics.loss, cfg.metrics.other, cfg.model.label_type)

    batch = _synthetic_batch(seed=9)
    state = run_trainer(cfg, model, variables, ListLoader([batch] * 4), None,
                        optimizer, schedule, loss_fn, metric_fns)

    out = cfg.output_dir
    assert osp.islink(osp.join(out, "weights_ema.msgpack"))
    ema_vars = load_weights(osp.join(out, "weights_ema.msgpack"))
    for a, b in zip(jax.tree_util.tree_leaves(ema_vars["params"]),
                    jax.tree_util.tree_leaves(jax.device_get(state.param_ema))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_pred, _ = model.apply(ema_vars, batch["template"], batch["source"])
    assert np.all(np.isfinite(np.asarray(y_pred)))
