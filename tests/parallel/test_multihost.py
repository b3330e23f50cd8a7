"""Multi-host wiring: per-host loader shards, rank-gated writes, env init.

The reference has no distributed training (SURVEY §2.4); the TPU rebuild's
pod story is per-host input pipelines + DP mesh + primary-only artifact
writes. These tests pin the host-side half on one process: shard streams
must be disjoint, lockstep-length and full-batch; non-primary ranks must
write nothing; the env contract must no-op on single host.
"""
import os

import numpy as np
import pytest
import yaml

from deepclr_tpu.config import Mode, create_default_config, finish_config
from deepclr_tpu.data import make_data_loader
from deepclr_tpu.data.pack import PackWriter
from deepclr_tpu.parallel import maybe_initialize

N_FRAMES = 26
N_PTS = 64


@pytest.fixture(scope="module")
def pack_cfg(tmp_path_factory):
    ws = tmp_path_factory.mktemp("multihost")
    rng = np.random.default_rng(0)
    pose = np.eye(4)
    with PackWriter(str(ws / "train.pack")) as w:
        for i in range(N_FRAMES):
            pose = pose.copy()
            pose[0, 3] += 0.25
            w.put(f"{i:08d}", {
                "idx": i, "timestamp": float(i), "pose": pose,
                "cloud": rng.normal(size=(N_PTS, 4)).astype(np.float32),
            })

    cfg = create_default_config(Mode.TEST)
    cfg.read_dict({
        "base_dir": str(ws),
        "data": {
            "training": str(ws / "train.pack"),
            "validation": str(ws / "train.pack"),
            "dataset_type": "kitti_odometry_velodyne",
            "sequential": True,
        },
        "data_loader": {"batch_size": 2, "num_points": N_PTS,
                        "num_workers": 0, "buffer_size": 0},
        "model": {
            "input_dim": 4, "point_dim": 3,
            "label_type": "pose3d_dual_quat", "model_type": "deepclr",
        },
        "optimizer": {"max_iterations": 10},
    })
    finish_config(cfg)
    return cfg


def _sample_ids(loader):
    """Identify every sample in every batch by its timestamp."""
    ids, sizes = [], []
    for batch in loader:
        stamps = np.asarray(batch["t"])
        sizes.append(stamps.shape[0])
        ids.extend(float(np.ravel(s)[-1]) for s in stamps)
    return ids, sizes


@pytest.mark.parametrize("num_shards", [2, 3])
def test_loader_shards_disjoint_lockstep(pack_cfg, num_shards):
    loaders = [
        make_data_loader(pack_cfg, is_train=True,
                         shard_index=i, num_shards=num_shards)
        for i in range(num_shards)
    ]
    # lockstep: every host sees the same number of steps per epoch
    lengths = [len(ld) for ld in loaders]
    assert len(set(lengths)) == 1 and lengths[0] > 0

    all_ids = []
    for ld in loaders:
        ids, sizes = _sample_ids(ld)
        assert len(sizes) == lengths[0]
        # full batches only: multi-host global-array assembly requires
        # shape-consistent local slices
        assert set(sizes) == {pack_cfg.data_loader.batch_size}
        all_ids.append(ids)

    # disjoint shards
    for i in range(num_shards):
        for j in range(i + 1, num_shards):
            assert not set(all_ids[i]) & set(all_ids[j])

    # coverage: together the shards see all but the cross-shard remainder
    n_samples = N_FRAMES - 1  # sequential pairs
    covered = sum(len(ids) for ids in all_ids)
    per_shard = (n_samples // num_shards
                 // pack_cfg.data_loader.batch_size
                 * pack_cfg.data_loader.batch_size)
    assert covered == num_shards * per_shard


def test_unsharded_loader_unchanged(pack_cfg):
    loader = make_data_loader(pack_cfg, is_train=True)
    ids, _ = _sample_ids(loader)
    assert len(set(ids)) == len(ids)
    assert len(ids) == (N_FRAMES - 1) // 2 * 2


def test_nonprimary_rank_writes_nothing(pack_cfg, tmp_path, monkeypatch):
    """A secondary host trains but produces zero artifacts (no config
    snapshot, no checkpoints, no logs, no tensorboard)."""
    import deepclr_tpu.engine.trainer as trainer_mod
    from deepclr_tpu.engine import run_trainer
    from deepclr_tpu.losses import make_loss_fn, make_metric_fns
    from deepclr_tpu.models import build_model, init_params
    from deepclr_tpu.solver import make_optimizer, make_schedule
    import jax

    monkeypatch.setattr(trainer_mod, "is_primary", lambda: False)
    monkeypatch.setattr(trainer_mod, "process_index", lambda: 1)

    cfg = pack_cfg
    cfg.defrost()
    cfg.output_dir = str(tmp_path / "rank1_out")
    cfg.read_dict({
        "model": {"params": {
            "batch_norm": False, "dropout": 1.0,
            "cloud_features": {"name": "SetAbstraction", "params": {
                "npoint": [16], "radii": [[0.6, 1.2]], "nsamples": [[4, 8]],
                "mlps": [[[4, 8], [4, 8]]]}},
            "merge": {"name": "MotionEmbedding",
                      "params": {"k": 4, "radius": 10.0, "mlp": [8, 16]}},
            "output": {"name": "OutputSimple",
                       "params": {"mlp": [16, 32], "linear": [32, 16]}},
        }},
        "metrics": {"loss": [
            {"type": "trans", "weights": [1.0], "params": {"p": 2}},
            {"type": "rot", "weights": [200.0], "params": {"p": 2}},
        ]},
        "optimizer": {"name": "Adam", "max_iterations": 2, "base_lr": 1e-4},
        "logging": {"log_period": 1, "summary_period": 1,
                    "checkpoint_period": 1, "validation_period": 100},
    })
    cfg.freeze()

    model = build_model(cfg.model)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=N_PTS)
    loader = make_data_loader(cfg, is_train=True)
    run_trainer(cfg, model, variables, loader, None,
                make_optimizer(cfg), make_schedule(cfg),
                make_loss_fn(cfg.metrics.loss, cfg.model.label_type),
                make_metric_fns(cfg.metrics.loss, cfg.metrics.other,
                                cfg.model.label_type))

    assert not os.path.exists(cfg.output_dir), (
        "secondary rank created artifacts: "
        + str(os.listdir(cfg.output_dir))
    )


def test_maybe_initialize_single_host_noop(monkeypatch):
    for var in ("DEEPCLR_COORDINATOR", "DEEPCLR_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize() is False


def test_two_process_training_end_to_end(tmp_path):
    """A real 2-process pod-style launch of scripts/training.py: two
    CPU processes join one jax runtime (gloo collectives), shard the data
    per host, train over a 2-device global DP mesh, and only the primary
    writes the experiment artifacts.  Zero code edits — the env contract
    (DEEPCLR_COORDINATOR/NUM_PROCESSES/PROCESS_ID) is the whole launch."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    ws = tmp_path
    rng = np.random.default_rng(0)
    pose = np.eye(4)
    with PackWriter(str(ws / "train.pack")) as w:
        for i in range(10):
            pose = pose.copy()
            pose[0, 3] += 0.3
            w.put(f"{i:08d}", {"idx": i, "timestamp": float(i), "pose": pose,
                               "cloud": rng.normal(size=(N_PTS, 4)).astype(np.float32)})
    cfg = {
        "base_dir": str(ws / "models"),
        "identifier": "pod",
        "data": {"training": str(ws / "train.pack"),
                 "dataset_type": "kitti_odometry_velodyne",
                 "sequential": True},
        "data_loader": {"batch_size": 2, "num_points": N_PTS,
                        "num_workers": 0, "buffer_size": 0},
        "model": {
            "input_dim": 4, "point_dim": 3,
            "label_type": "pose3d_dual_quat", "model_type": "deepclr",
            "params": {
                "batch_norm": False, "dropout": 1.0,
                "cloud_features": {"name": "SetAbstraction", "params": {
                    "npoint": [16], "radii": [[0.6, 1.2]],
                    "nsamples": [[4, 8]], "mlps": [[[4, 8], [4, 8]]]}},
                "merge": {"name": "MotionEmbedding",
                          "params": {"k": 4, "radius": 10.0, "mlp": [8, 16]}},
                "output": {"name": "OutputSimple",
                           "params": {"mlp": [16, 32], "linear": [32, 16]}},
            },
        },
        "metrics": {"loss": [
            {"type": "trans", "weights": [1.0], "params": {"p": 2}},
            {"type": "rot", "weights": [200.0], "params": {"p": 2}},
        ]},
        "optimizer": {"name": "Adam", "max_iterations": 4, "base_lr": 1e-4},
        "logging": {"summary_period": 100, "log_period": 2,
                    "checkpoint_period": 100, "validation_period": 100},
    }
    (ws / "models").mkdir()
    with open(ws / "train.yaml", "w") as f:
        yaml.dump(cfg, f)

    def launch(rank):
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env.update({
            "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu",
            "JAX_NUM_CPU_DEVICES": "1",
            "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
            "XLA_FLAGS": "",  # drop the 8-device virtual flag
            "DEEPCLR_COORDINATOR": "127.0.0.1:9435",
            "DEEPCLR_NUM_PROCESSES": "2",
            "DEEPCLR_PROCESS_ID": str(rank),
        })
        return subprocess.Popen(
            [sys.executable, "-u", str(repo / "scripts" / "training.py"),
             str(ws / "train.yaml")],
            env=env, cwd=str(repo),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    procs = [launch(0), launch(1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    assert procs[0].returncode == 0, outs[0]
    assert procs[1].returncode == 0, outs[1]

    # global mesh spanned both hosts' devices
    assert "'dp': 2" in outs[0], outs[0]
    # primary wrote the one experiment dir with a final checkpoint;
    # the secondary wrote nothing
    import glob as _glob
    exp_dirs = [d for d in _glob.glob(str(ws / "models" / "*"))
                if os.path.isdir(d)]
    assert len(exp_dirs) == 1, exp_dirs
    assert _glob.glob(os.path.join(exp_dirs[0], "ckpt_final_*.msgpack"))
