"""Segmented training driver (scripts/train_supervised.py): resume loop +
interrupt-checkpoint contract, on a micro CPU config."""
import glob
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest
import yaml

from deepclr_tpu.data.pack import PackWriter

REPO = Path(__file__).resolve().parents[2]


def _env(ws):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["MODEL_PATH"] = str(ws / "models")
    env["WS"] = str(ws)
    return env


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("supervised")
    rng = np.random.default_rng(0)
    pose = np.eye(4)
    with PackWriter(str(ws / "train.pack")) as w:
        for i in range(8):
            pose = pose.copy()
            pose[0, 3] += 0.3
            cloud = rng.normal(size=(256, 4)).astype(np.float32)
            w.put(f"{i:08d}", {"idx": i, "timestamp": float(i),
                               "pose": pose, "cloud": cloud})
    cfg = {
        "base_dir": "${MODEL_PATH}",
        "identifier": "micro",
        "data": {
            "training": str(ws / "train.pack"),
            "dataset_type": "kitti_odometry_velodyne",
            "sequential": True,
        },
        "data_loader": {"batch_size": 2, "num_points": 256,
                        "num_workers": 1, "buffer_size": 2},
        "model": {
            "input_dim": 4, "point_dim": 3,
            "label_type": "pose3d_dual_quat", "model_type": "deepclr",
            "params": {
                "batch_norm": False, "dropout": 1.0,
                "cloud_features": {"name": "SetAbstraction", "params": {
                    "npoint": [32], "radii": [[0.6, 1.2]],
                    "nsamples": [[8, 16]],
                    "mlps": [[[8, 8, 16], [8, 8, 16]]]}},
                "merge": {"name": "MotionEmbedding",
                          "params": {"k": 4, "radius": 10.0, "mlp": [16, 32]}},
                "output": {"name": "OutputSimple",
                           "params": {"mlp": [32, 64], "linear": [64, 32]}},
            },
        },
        "metrics": {"loss": [
            {"type": "trans", "weights": [1.0], "params": {"p": 2}},
            {"type": "rot", "weights": [200.0], "params": {"p": 2}},
        ]},
        "optimizer": {"name": "Adam", "max_iterations": 6, "base_lr": 1e-4},
        "logging": {"summary_period": 100, "log_period": 2,
                    "checkpoint_period": 2, "checkpoint_n_saved": 5,
                    "validation_period": 100},
    }
    with open(ws / "train.yaml", "w") as f:
        yaml.dump(cfg, f)
    (ws / "models").mkdir()
    return ws


def test_supervised_resume_completes(workspace):
    """Segment 1: plain training to iteration 4 of 6 (SIGINT after the
    first checkpoint lands).  Segment 2+: the supervisor resumes from the
    interrupt checkpoint and finishes the schedule."""
    env = _env(workspace)
    child = subprocess.Popen(
        [sys.executable, "-u", str(REPO / "scripts" / "training.py"),
         str(workspace / "train.yaml")],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + 600
    while time.time() < deadline:
        if glob.glob(str(workspace / "models" / "*" / "ckpt_2.msgpack")):
            break
        if child.poll() is not None:
            break
        time.sleep(1.0)
    else:  # pragma: no cover
        child.kill()
        pytest.fail("no checkpoint within deadline")
    if child.poll() is None:
        child.send_signal(signal.SIGINT)
    out, _ = child.communicate(timeout=300)
    assert child.returncode == 0, out
    interrupts = glob.glob(
        str(workspace / "models" / "*" / "ckpt_interrupt_*.msgpack")
    )
    finals = glob.glob(
        str(workspace / "models" / "*" / "ckpt_final_*.msgpack")
    )
    assert interrupts or finals, out  # clean exit persisted a resumable state

    if not finals:
        proc = subprocess.run(
            [sys.executable, "-u", str(REPO / "scripts" / "train_supervised.py"),
             str(workspace / "train.yaml"), "--ckpt", max(
                 interrupts, key=os.path.getmtime),
             "--poll-seconds", "1"],
            env=env, cwd=str(REPO), capture_output=True, text=True,
            timeout=900,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        finals = glob.glob(
            str(workspace / "models" / "*" / "ckpt_final_*.msgpack")
        )
    assert finals


def test_supervisor_detects_finished(workspace):
    """A completed experiment (final checkpoint in base_dir) short-circuits
    after one child run."""
    from scripts.train_supervised import finished, latest_checkpoint

    base = str(workspace / "models")
    assert finished(base)
    assert latest_checkpoint(base) is not None
