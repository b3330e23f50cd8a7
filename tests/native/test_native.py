"""Native C++ components: pack reader equivalence + KITTI devkit evaluator."""
import os.path as osp

import numpy as np
import pytest

from deepclr_tpu.data.pack import PackWriter
from deepclr_tpu.native import build_library, kitti_devkit_eval
from deepclr_tpu.native.pack_reader import NativePackReader


def test_native_pack_reader_matches_python(tmp_path):
    path = str(tmp_path / "t.pack")
    rng = np.random.default_rng(0)
    records = {
        f"{i:08d}": {
            "idx": i,
            "cloud": rng.normal(size=(50 + i, 4)).astype(np.float32),
            "pose": np.eye(4),
            "name": f"rec{i}",
        }
        for i in range(5)
    }
    with PackWriter(path) as w:
        for k, v in records.items():
            w.put(k, v)

    with NativePackReader(path) as r:
        assert len(r) == 5
        assert r.keys == sorted(records)
        for k, v in records.items():
            got = r[k]
            assert got["idx"] == v["idx"]
            assert got["name"] == v["name"]
            np.testing.assert_array_equal(got["cloud"], v["cloud"])
        with pytest.raises(KeyError):
            r["missing"]


def _write_poses(path, poses):
    rows = [np.asarray(p)[:3, :].reshape(12) for p in poses]
    np.savetxt(path, np.asarray(rows))


def test_kitti_devkit_eval(tmp_path):
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()

    # straight 1 m/frame drive, 150 frames; prediction has 2% scale drift
    gt, pred = [], []
    for i in range(150):
        g = np.eye(4)
        g[0, 3] = i * 1.0
        p = np.eye(4)
        p[0, 3] = i * 1.02
        gt.append(g)
        pred.append(p)
    _write_poses(gt_dir / "04.txt", gt)
    _write_poses(pred_dir / "04.txt", pred)

    n = kitti_devkit_eval(str(gt_dir), str(pred_dir))
    assert n == 1

    result = pred_dir / "result"
    assert (result / "errors_04.txt").exists()
    stats = (result / "stats.txt").read_text()
    assert "04" in stats and "TOTAL" in stats

    # ~2% translation error, ~0 rotation error
    for line in stats.splitlines():
        if line.startswith("04"):
            parts = line.split()
            t_err = float(parts[2])
            r_err = float(parts[4])
            assert t_err == pytest.approx(2.0, rel=0.05)
            assert r_err == pytest.approx(0.0, abs=1e-9)

    # plot artifacts (reference devkit writes path + error plots into
    # pred_dir/result, extern/kitti_devkit.patch:28-60)
    from deepclr_tpu.kitti_devkit.plots import write_plots

    seqs = write_plots(str(gt_dir), str(pred_dir))
    assert seqs == ["04"]
    assert (result / "04_path.png").exists()
    assert (result / "04_tl.png").exists()
    assert (result / "avg_tl.png").exists()
    assert (result / "avg_rs.png").exists()


def test_standalone_binaries_build():
    build_library("kitti_devkit")
    build_library("pack_reader")
    build_library("morton_sort")
    assert osp.exists(build_library("kitti_devkit"))


def test_native_morton_sort_bit_identical():
    """The native radix Morton sort must equal the numpy stable-argsort
    path exactly — same double-precision quantization, stable order on
    tied keys — so pad_points(morton=True) is path-independent."""
    from deepclr_tpu.native.morton_sort import (
        morton_sort_rows_native, native_morton_available,
    )
    from deepclr_tpu.ops.morton import morton_argsort_np

    if not native_morton_available():
        pytest.skip("native morton_sort unavailable")

    rng = np.random.default_rng(3)
    cases = [
        (rng.normal(size=(4096, 4)) * 30).astype(np.float32),
        # tied keys: repeated points exercise sort stability
        np.repeat((rng.normal(size=(256, 4)) * 5).astype(np.float32),
                  8, axis=0),
        # degenerate axis (LiDAR-flat z) + extra feature columns
        np.concatenate(
            [rng.normal(size=(1000, 2)) * 50, np.zeros((1000, 1)),
             rng.random((1000, 2))], axis=1).astype(np.float32),
        (rng.normal(size=(1, 3))).astype(np.float32),
    ]
    for cloud in cases:
        ref = cloud[morton_argsort_np(cloud)]
        np.testing.assert_array_equal(morton_sort_rows_native(cloud), ref)


def test_pad_points_morton_native_matches_numpy(monkeypatch):
    """pad_points(morton=True) gives identical batches with the native
    path enabled and disabled (DEEPCLR_NATIVE_PAD=0)."""
    import importlib

    import deepclr_tpu.data.batching as batching
    import deepclr_tpu.native.morton_sort as ms

    rng = np.random.default_rng(7)
    cloud = (rng.normal(size=(900, 4)) * 20).astype(np.float32)

    out_native, mask_native = batching.pad_points(
        cloud.copy(), 1024, np.random.default_rng(0), morton=True)

    monkeypatch.setenv("DEEPCLR_NATIVE_PAD", "0")
    importlib.reload(ms)  # drop the cached library handle
    try:
        out_py, mask_py = batching.pad_points(
            cloud.copy(), 1024, np.random.default_rng(0), morton=True)
    finally:
        monkeypatch.delenv("DEEPCLR_NATIVE_PAD")
        importlib.reload(ms)

    np.testing.assert_array_equal(out_native, out_py)
    np.testing.assert_array_equal(mask_native, mask_py)
