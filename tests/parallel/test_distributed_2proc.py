"""REAL two-process ``jax.distributed`` validation.

tests/parallel/test_multihost.py pins the host-side contracts (shard
disjointness, rank gating) inside ONE process; this test actually runs
``jax.distributed.initialize()`` with two OS processes over a 127.0.0.1
coordinator — the thing a pod launch does — and asserts:

  * both ranks complete a full ``scripts/training.py`` run (rc 0) on a
    2-process x 4-virtual-CPU-device global mesh (psum over a mesh that
    spans processes),
  * the training loss trajectory equals a single-process 8-device run of
    the same global batch (the per-host interleaved shards reassemble the
    same global batches; equality up to fp reassociation),
  * only rank 0 writes artifacts (checkpoints, scalars, logs).

No reference analog (the reference is single-GPU, SURVEY §2.4); this is
the TPU-idiomatic distributed story validated with real processes.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from deepclr_tpu.data.pack import PackWriter

REPO = Path(__file__).resolve().parents[2]

N_FRAMES = 33          # -> 32 sequential pairs
N_PTS = 64             # == num_points: no subsample/pad randomness
GLOBAL_BATCH = 8
ITERATIONS = 12


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_pack(path: Path) -> None:
    rng = np.random.default_rng(7)
    pose = np.eye(4)
    with PackWriter(str(path)) as w:
        for i in range(N_FRAMES):
            pose = pose.copy()
            pose[0, 3] += 0.3
            pose[1, 3] += 0.05
            w.put(f"{i:08d}", {
                "idx": i, "timestamp": float(i), "pose": pose,
                "cloud": rng.normal(size=(N_PTS, 4)).astype(np.float32),
            })


def _write_cfg(ws: Path, name: str, batch_size: int) -> Path:
    cfg = {
        "base_dir": str(ws / name),
        "identifier": name,
        "seed": 3,
        "data": {"training": str(ws / "train.pack"),
                 "validation": str(ws / "train.pack"),
                 "dataset_type": "kitti_odometry_velodyne",
                 "sequential": True},
        # no augmentation transforms: shard-order-invariant batch content
        "data_loader": {"batch_size": batch_size, "num_points": N_PTS,
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
        "optimizer": {"name": "Adam", "max_iterations": ITERATIONS,
                      "base_lr": 1e-4},
        "logging": {"summary_period": 1, "log_period": 100,
                    "checkpoint_period": 1000, "checkpoint_n_saved": 2,
                    "validation_period": 1000},
    }
    (ws / name).mkdir(exist_ok=True)
    p = ws / f"{name}.yaml"
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    return p


def _env(n_devices: int, extra=None) -> dict:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
        "PYTHONPATH": str(REPO) + os.pathsep + env.get("PYTHONPATH", ""),
    })
    if extra:
        env.update(extra)
    return env


def _scalars(base_dir: Path) -> list:
    files = sorted(base_dir.glob("*/scalars.jsonl"))
    assert len(files) == 1, f"expected one scalars.jsonl, got {files}"
    return [json.loads(line) for line in files[0].read_text().splitlines()
            if "tag" in line]


def _loss_series(base_dir: Path) -> list:
    series = {}
    for rec in _scalars(base_dir):
        if rec.get("tag") == "train/loss_fn":
            series[rec["step"]] = rec["value"]
    return [series[k] for k in sorted(series)]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    ws = tmp_path
    _make_pack(ws / "train.pack")

    # single-process 8-device run, global batch 8
    cfg1 = _write_cfg(ws, "single", GLOBAL_BATCH)
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "training.py"), str(cfg1)],
        env=_env(8), capture_output=True, text=True, timeout=900,
        cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    single = _loss_series(ws / "single")
    assert len(single) == ITERATIONS

    # two processes x 4 devices, per-host batch 4 -> same global batch 8
    cfg2 = _write_cfg(ws, "twoproc", GLOBAL_BATCH // 2)
    port = _free_port()
    procs = []
    for rank in range(2):
        extra = {
            "DEEPCLR_COORDINATOR": f"127.0.0.1:{port}",
            "DEEPCLR_NUM_PROCESSES": "2",
            "DEEPCLR_PROCESS_ID": str(rank),
        }
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "scripts" / "training.py"),
             str(cfg2)],
            env=_env(4, extra), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, cwd=str(REPO),
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        f"rank0 rc={procs[0].returncode}:\n{outs[0][-3000:]}\n"
        f"rank1 rc={procs[1].returncode}:\n{outs[1][-3000:]}"
    )

    # rank gating: exactly one experiment dir contains artifacts
    two = _loss_series(ws / "twoproc")
    ckpts = list((ws / "twoproc").glob("*/ckpt_final_*.msgpack"))
    assert len(ckpts) == 1
    nonempty = [d for d in (ws / "twoproc").glob("*")
                if d.is_dir() and any(d.iterdir())]
    assert len(nonempty) == 1, f"non-primary rank wrote files: {nonempty}"

    # trajectory equality: same global batches (interleaved shards
    # reassemble them), so losses agree up to fp reassociation
    assert len(two) == ITERATIONS
    np.testing.assert_allclose(np.asarray(two), np.asarray(single),
                               rtol=5e-3, atol=1e-5)

    # validation observability survives multihost: the primary rank
    # produces the SAME val/* scalar set as the single-process run
    # (scalar means AND the gathered trajectory/segment-error export)
    val_single = {r["tag"] for r in _scalars(ws / "single")
                  if r.get("tag", "").startswith("val/")}
    val_two = {r["tag"] for r in _scalars(ws / "twoproc")
               if r.get("tag", "").startswith("val/")}
    assert val_single, "single-process run produced no val scalars"
    assert val_two == val_single, (val_two, val_single)
    assert "val/step_t_err" in val_two
