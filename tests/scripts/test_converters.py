"""Converter CLI integration: raw synthetic KITTI layout -> odometry packs,
DeepVCP pairs packs, perturbed pairs test packs — the full conversion
surface the pairs-protocol study depends on (reference
scripts/converter/{kitti_odometry,kitti_pairs,kitti_pairs_test}.py)."""
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from deepclr_tpu.data import DatasetType, create_input_dataflow

REPO = osp.realpath(osp.join(osp.dirname(__file__), "..", ".."))
SCRIPTS = osp.join(REPO, "scripts")


def _run(args, env):
    result = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, env=env,
        cwd=REPO, timeout=600,
    )
    assert result.returncode == 0, (
        f"{args}\nSTDOUT:\n{result.stdout[-2000:]}\n"
        f"STDERR:\n{result.stderr[-3000:]}"
    )
    return result


@pytest.fixture(scope="module")
def kitti_ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("kitti_conv")
    env = dict(os.environ)
    env.update({
        "KITTI_PATH": str(ws),
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    _run([osp.join(SCRIPTS, "make_synthetic_kitti.py"), str(ws),
          "--sequences", "00,01", "--frames", "12", "--points", "512"], env)
    return ws, env


def test_kitti_odometry_converter(kitti_ws):
    ws, env = kitti_ws
    _run([osp.join(SCRIPTS, "converter", "kitti_odometry.py")], env)
    pack = ws / "odometry" / "00.pack"
    assert pack.exists()
    df = create_input_dataflow(DatasetType.KITTI_ODOMETRY_VELODYNE,
                               str(pack), shuffle=False)
    samples = list(df)
    assert len(samples) == 11  # 12 frames -> 11 sequential pairs
    s = samples[0]
    assert s["clouds"][0].shape[1] == 4
    assert s["transform"].shape == (4, 4)
    # ~1.2 m/frame forward motion in the generator
    assert 0.2 < np.linalg.norm(s["transform"][:3, 3]) < 3.0


def test_kitti_pairs_converter(kitti_ws):
    ws, env = kitti_ws
    _run([osp.join(SCRIPTS, "converter", "kitti_pairs.py")], env)
    pack = ws / "pairs" / "00.pack"
    assert pack.exists()
    df = create_input_dataflow(DatasetType.GENERIC, str(pack), shuffle=False)
    samples = list(df)
    # anchor frame 0, pairs with following frames within 5 m
    assert len(samples) >= 2
    for s in samples:
        assert s["clouds"][0].shape[1] == 4
        # RemoveTransform baked the GT motion into the source cloud:
        # the stored label is (near-)identity
        np.testing.assert_allclose(s["transform"], np.eye(4), atol=1e-5)


def test_kitti_pairs_test_converter(kitti_ws):
    ws, env = kitti_ws
    if not (ws / "pairs" / "00.pack").exists():
        _run([osp.join(SCRIPTS, "converter", "kitti_pairs.py")], env)
    _run([osp.join(SCRIPTS, "converter", "kitti_pairs_test.py")], env)
    pack = ws / "pairs_test" / "00.pack"
    assert pack.exists()
    df = create_input_dataflow(DatasetType.GENERIC, str(pack), shuffle=False)
    samples = list(df)
    assert len(samples) >= 2
    # the uniform +/-1 m, +/-1 deg perturbation is baked into the source
    # cloud and reflected in the label: transforms are non-identity
    deltas = [np.linalg.norm(s["transform"][:3, 3]) for s in samples]
    assert max(deltas) > 0.05
    for s in samples:
        assert np.abs(s["transform"][:3, 3]).max() <= 1.0 * np.sqrt(3) + 1e-6