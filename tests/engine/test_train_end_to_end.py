"""Full train() integration: config yaml -> pack data -> loader -> jitted
training with validation + checkpoints, through the public entry point."""
import os.path as osp

import numpy as np
import pytest
import yaml

from deepclr_tpu.config import Mode, load_config
from deepclr_tpu.data.pack import PackWriter
from deepclr_tpu.engine import train

N_FRAMES = 17
NUM_POINTS = 128


def _write_kitti_pack(path, n_frames=N_FRAMES, seed=0):
    rng = np.random.default_rng(seed)
    with PackWriter(str(path)) as w:
        for i in range(n_frames):
            pose = np.eye(4)
            pose[0, 3] = i * 1.0
            pose[1, 3] = 0.1 * np.sin(i)
            w.put(f"{i:08d}", {
                "idx": i,
                "timestamp": i * 0.1e6,
                "pose": pose,
                "cloud": rng.normal(size=(100 + 5 * i, 4)).astype(np.float32) * 5,
            })


@pytest.fixture(scope="module")
def train_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("train_cli")
    _write_kitti_pack(tmp_path / "00.pack")

    cfg_dict = {
        "base_dir": str(tmp_path / "models"),
        "identifier": "smoke",
        "seed": 1,
        "data": {
            "training": str(tmp_path / "00.pack"),
            "validation": str(tmp_path / "00.pack"),
            "dataset_type": "kitti_odometry_velodyne",
            "sequential": True,
        },
        "transforms": {
            "point_noise": {"scale": 0.01},
            "translation_noise": {"scale": [0.1, 0.01, 0.01]},
            "rotation_noise_deg": {"scale": [0.1, 0.1, 0.5]},
        },
        "data_loader": {"batch_size": 4, "num_points": NUM_POINTS,
                        "num_workers": 0, "buffer_size": 0},
        "model": {
            "input_dim": 4,
            "point_dim": 3,
            "label_type": "pose3d_dual_quat",
            "model_type": "deepclr",
            "params": {
                "batch_norm": False,
                "dropout": 1.0,
                "cloud_features": {
                    "name": "SetAbstraction",
                    "params": {
                        "npoint": [32],
                        "radii": [[1.0, 2.0]],
                        "nsamples": [[8, 16]],
                        "mlps": [[[8, 8, 16], [8, 8, 16]]],
                    },
                },
                "merge": {
                    "name": "MotionEmbedding",
                    "params": {"k": 4, "radius": 10.0, "mlp": [16, 32]},
                },
                "output": {
                    "name": "OutputSimple",
                    "params": {"mlp": [32, 64], "linear": [64, 32]},
                },
            },
        },
        "metrics": {
            "loss": [
                {"type": "trans", "weights": [1.0], "params": {"p": 2}},
                {"type": "rot", "weights": [200.0], "params": {"p": 2}},
            ],
            "other": [{"type": "quat_norm"}],
        },
        "optimizer": {
            "name": "Ranger",
            "base_lr": 0.001,
            "max_iterations": 8,
            "accumulation_steps": 2,
        },
        "scheduler": {
            "name": "CyclicLRWithFlatAndCosineAnnealing",
            "on_iteration": True,
            "params": {
                "cyclic_iterations": 4, "flat_iterations": 2,
                "annealing_iterations": 2, "base_lr": 1e-4, "max_lr": 1e-3,
                "step_size_up": 2, "mode": "triangular",
            },
        },
        "logging": {
            "log_period": 2, "summary_period": 2,
            "checkpoint_period": 4, "validation_period": 8,
            "checkpoint_n_saved": 3,
        },
    }
    cfg_file = tmp_path / "train.yaml"
    with open(cfg_file, "w") as f:
        yaml.dump(cfg_dict, f)

    cfg = load_config(str(cfg_file), Mode.NEW)
    train(cfg)
    return cfg


def test_train_creates_experiment_artifacts(train_run):
    cfg = train_run
    out = cfg.output_dir
    assert osp.isdir(out)
    assert osp.exists(osp.join(out, "config.yaml"))
    assert osp.exists(osp.join(out, "model_config.yaml"))
    assert osp.exists(osp.join(out, "models", "deepclr.py"))
    assert osp.islink(osp.join(out, "ckpt.msgpack"))
    assert osp.islink(osp.join(out, "weights.msgpack"))
    assert osp.exists(osp.join(out, "ckpt_final_8.msgpack"))
    assert osp.exists(osp.join(out, "scalars.jsonl"))


def test_scalars_logged(train_run):
    import json

    cfg = train_run
    tags = set()
    with open(osp.join(cfg.output_dir, "scalars.jsonl")) as f:
        for line in f:
            tags.add(json.loads(line).get("tag"))
    assert "train/loss" in tags
    assert "params/lr" in tags
    assert "val/loss_fn" in tags
    assert "val/step_t_err" in tags
    assert "val/kitti_t_err" in tags  # sequential data -> segment errors


def test_model_config_reloadable_for_inference(train_run):
    """The written model_config.yaml + weights must load via the inference
    path (load_model_config + load_weights)."""
    import jax

    from deepclr_tpu.config import load_model_config
    from deepclr_tpu.models import build_model, init_params, load_weights

    cfg = train_run
    model_cfg = load_model_config(
        osp.join(cfg.output_dir, "model_config.yaml"),
        osp.join(cfg.output_dir, "weights.msgpack"),
    )
    model = build_model(model_cfg)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=NUM_POINTS)
    loaded = load_weights(osp.join(cfg.output_dir, "weights.msgpack"), variables)
    # weights change shape-compatibly and are finite
    for leaf in jax.tree_util.tree_leaves(loaded):
        assert np.isfinite(np.asarray(leaf)).all()
