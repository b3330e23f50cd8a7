"""Kill-point stress test: training killed at arbitrary points (SIGINT and
SIGKILL) always resumes to schedule completion.

The de-facto production mode on hosts whose accelerator client leaks memory
is segmented training (scripts/train_supervised.py): bound each process's
lifetime, interrupt, resume.  This test kills the child at a point chosen
by signal type — SIGINT exercises the interrupt-checkpoint contract at any
moment (including the post-loop shutdown window); SIGKILL exercises crash
recovery from the last periodic checkpoint.  Reference contract being
hardened: /root/reference/deepclr/engine/trainer.py:222-231.
"""
import glob
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import flax.serialization
import numpy as np
import pytest
import yaml

from deepclr_tpu.data.pack import PackWriter

REPO = Path(__file__).resolve().parents[2]
MAX_ITERATIONS = 6


def _env(ws):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["MODEL_PATH"] = str(ws / "models")
    return env


def _make_ws(tmp_path, identifier):
    ws = tmp_path
    rng = np.random.default_rng(0)
    pose = np.eye(4)
    with PackWriter(str(ws / "train.pack")) as w:
        for i in range(8):
            pose = pose.copy()
            pose[0, 3] += 0.3
            w.put(f"{i:08d}", {"idx": i, "timestamp": float(i),
                               "pose": pose,
                               "cloud": rng.normal(size=(128, 4)).astype(np.float32)})
    cfg = {
        "base_dir": "${MODEL_PATH}",
        "identifier": identifier,
        "data": {"training": str(ws / "train.pack"),
                 "dataset_type": "kitti_odometry_velodyne",
                 "sequential": True},
        "data_loader": {"batch_size": 2, "num_points": 128,
                        "num_workers": 0, "buffer_size": 1},
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
        "optimizer": {"name": "Adam", "max_iterations": MAX_ITERATIONS,
                      "base_lr": 1e-4},
        "logging": {"summary_period": 100, "log_period": 1,
                    "checkpoint_period": 1, "checkpoint_n_saved": 10,
                    "validation_period": 100},
    }
    with open(ws / "train.yaml", "w") as f:
        yaml.dump(cfg, f)
    (ws / "models").mkdir()
    return ws


def _final_iteration(ws):
    finals = glob.glob(str(ws / "models" / "*" / "ckpt_final_*.msgpack"))
    assert finals, "no final checkpoint"
    with open(max(finals, key=os.path.getmtime), "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return int(payload["iteration"])


@pytest.mark.parametrize("kill_sig,extra_delay", [
    (signal.SIGINT, 0.0),    # interrupt right after the first checkpoint
    (signal.SIGINT, 2.5),    # interrupt later (possibly post-completion)
    (signal.SIGKILL, 0.5),   # hard crash: no interrupt checkpoint possible
], ids=["sigint-early", "sigint-late", "sigkill"])
def test_kill_then_resume_completes(tmp_path, kill_sig, extra_delay):
    ws = _make_ws(tmp_path, f"kill{kill_sig}")
    env = _env(ws)

    child = subprocess.Popen(
        [sys.executable, "-u", str(REPO / "scripts" / "training.py"),
         str(ws / "train.yaml")],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for the first periodic checkpoint so a resume point exists even
    # for SIGKILL, then kill at the parametrized offset
    deadline = time.time() + 600
    while time.time() < deadline:
        if glob.glob(str(ws / "models" / "*" / "ckpt_1.msgpack")):
            break
        if child.poll() is not None:
            break
        time.sleep(0.25)
    else:  # pragma: no cover
        child.kill()
        pytest.fail("no checkpoint within deadline")
    if extra_delay:
        t0 = time.time()
        while time.time() - t0 < extra_delay and child.poll() is None:
            time.sleep(0.1)
    if child.poll() is None:
        child.send_signal(kill_sig)
    out, _ = child.communicate(timeout=300)

    if kill_sig == signal.SIGINT:
        # the interrupt contract: rc 0 at ANY kill point, resumable state
        assert child.returncode == 0, out
        persisted = glob.glob(str(ws / "models" / "*" / "ckpt_*.msgpack"))
        assert persisted, out

    # the supervisor resumes from whatever survived and finishes
    if not glob.glob(str(ws / "models" / "*" / "ckpt_final_*.msgpack")):
        ckpts = [c for c in glob.glob(str(ws / "models" / "*" / "ckpt*.msgpack"))
                 if not os.path.islink(c)]
        assert ckpts, "nothing to resume from"
        proc = subprocess.run(
            [sys.executable, "-u",
             str(REPO / "scripts" / "train_supervised.py"),
             str(ws / "train.yaml"),
             "--ckpt", max(ckpts, key=os.path.getmtime),
             "--poll-seconds", "1"],
            env=env, cwd=str(REPO), capture_output=True, text=True,
            timeout=900,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr

    assert _final_iteration(ws) == MAX_ITERATIONS
