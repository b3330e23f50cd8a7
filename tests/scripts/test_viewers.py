"""Raw-data viewer scripts run headless over synthetic raw datasets
(reference scripts/visualization/show_kitti_odometry.py / show_modelnet40.py)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
ENV = {**os.environ, "MPLBACKEND": "Agg",
       "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"}


def _make_kitti(base: Path, seq="00", frames=3):
    seq_dir = base / "sequences" / seq
    (seq_dir / "velodyne").mkdir(parents=True)
    (base / "poses").mkdir()
    rng = np.random.default_rng(0)
    poses = []
    for i in range(frames):
        cloud = rng.normal(size=(256, 4)).astype(np.float32)
        cloud.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
        m = np.eye(4)
        m[0, 3] = i * 1.0
        poses.append(m[:3, :].reshape(-1))
    np.savetxt(base / "poses" / f"{seq}.txt", np.stack(poses))
    (seq_dir / "calib.txt").write_text(
        "Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )
    np.savetxt(seq_dir / "times.txt", np.arange(frames) * 0.1)


def _make_modelnet(base: Path, shapes=("airplane",), per_shape=2):
    names = []
    rng = np.random.default_rng(0)
    for shape in shapes:
        (base / shape).mkdir(parents=True)
        for i in range(per_shape):
            name = f"{shape}_{i + 1:04d}"
            cloud = rng.normal(size=(128, 6)).astype(np.float32)
            np.savetxt(base / shape / f"{name}.txt", cloud, delimiter=",")
            names.append(name)
    listing = base / "modelnet40_test.txt"
    listing.write_text("\n".join(names) + "\n")
    return listing


def _run(script, *args):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / "visualization" / script),
         *map(str, args)],
        env=ENV, capture_output=True, text=True, timeout=300,
    )


def test_show_kitti_odometry(tmp_path):
    _make_kitti(tmp_path / "kitti")
    out = tmp_path / "renders"
    out.mkdir()
    r = _run("show_kitti_odometry.py", tmp_path / "kitti", "00",
             "--save-dir", out)
    assert r.returncode == 0, r.stderr
    assert (out / "cloud_000000.png").exists()
    assert (out / "path.png").exists()


def test_show_modelnet40(tmp_path):
    listing = _make_modelnet(tmp_path / "modelnet")
    out = tmp_path / "renders"
    out.mkdir()
    r = _run("show_modelnet40.py", listing, "--save-dir", out)
    assert r.returncode == 0, r.stderr
    assert (out / "model_000000.png").exists()
