"""Evaluation layer tests: Motion/Sequence formats, KITTI metrics, Evaluator."""
import numpy as np
import pytest

from deepclr_tpu.evaluation import (
    Evaluator,
    MetricsContainer,
    Motion,
    Sequence,
    TransformationMetrics,
)
from deepclr_tpu.evaluation.metrics import (
    rotation_error_chordal,
    rotation_error_kitti,
    translation_error_kitti,
)


def _transform(yaw=0.0, t=(0, 0, 0)):
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = t
    return m


def test_motion_accumulates_poses_and_distances():
    motion = Motion()
    step = _transform(t=(1.0, 0, 0))
    for _ in range(5):
        motion.add_transform(step)
    assert len(motion.poses) == 6
    np.testing.assert_allclose(motion.poses[-1][:3, 3], [5, 0, 0], atol=1e-12)
    np.testing.assert_allclose(motion.distances, np.arange(6.0))
    assert motion.get_frame_by_distance(0, 2.5) == 3
    assert motion.get_frame_by_distance(0, 100.0) == -1


def test_motion_pose_transform_round_trip():
    motion = Motion()
    rng = np.random.default_rng(0)
    for _ in range(10):
        motion.add_transform(_transform(yaw=rng.normal() * 0.1, t=rng.normal(size=3)))

    motion2 = Motion()
    for p in motion.poses:
        motion2.add_pose(p)
    for t1, t2 in zip(motion.transforms, motion2.transforms):
        np.testing.assert_allclose(t1, t2, atol=1e-10)


def test_sequence_txt_round_trip(tmp_path):
    seq = Sequence()
    rng = np.random.default_rng(1)
    for i in range(7):
        seq.add_transforms(
            float(i) * 0.1,
            _transform(yaw=rng.normal() * 0.05, t=rng.normal(size=3)),
            _transform(yaw=rng.normal() * 0.05, t=rng.normal(size=3)),
            time=float(i),
        )
    f = tmp_path / "seq.txt"
    seq.write(str(f))
    # 26-column contract: stamp, 12 pred, 12 gt, time
    data = np.loadtxt(str(f))
    assert data.shape == (7, 26)

    seq2 = Sequence.read(str(f))
    assert seq2.stamps == pytest.approx(seq.stamps)
    assert seq2.times == pytest.approx(seq.times)
    for a, b in zip(seq.prediction.transforms, seq2.prediction.transforms):
        np.testing.assert_allclose(a, b, atol=1e-10)


def test_error_metrics_known_values():
    ident = np.eye(4)
    moved = _transform(t=(3.0, 4.0, 0.0))
    err, vec = translation_error_kitti(ident, moved)
    assert err == pytest.approx(5.0)

    rot = _transform(yaw=np.deg2rad(10.0))
    err, _ = rotation_error_kitti(ident, rot)
    assert np.rad2deg(err) == pytest.approx(10.0, abs=1e-6)
    assert rotation_error_chordal(ident, rot) == pytest.approx(np.deg2rad(10.0), abs=1e-6)

    # error is symmetric (min over both directions)
    e1, _ = rotation_error_kitti(rot, ident)
    e2, _ = rotation_error_kitti(ident, rot)
    assert e1 == pytest.approx(e2)


def test_evaluator_step_and_segment_errors():
    ev = Evaluator()
    # straight 10 m/s drive for 150 frames (15 m ... 150 m), pred has small bias
    gt_step = _transform(t=(1.0, 0, 0))
    pred_step = _transform(t=(1.01, 0, 0))  # 1% translation error
    for i in range(150):
        ev.add_transforms("00", i * 0.1, pred_step, gt_step)

    step = ev.get_total_step_errors()
    assert step.mean.translation.kitti == pytest.approx(0.01, abs=1e-9)
    assert step.mean.rotation.kitti == pytest.approx(0.0, abs=1e-9)

    seg = ev.get_total_segment_errors()
    assert len(seg) > 0
    # all segments are 100 m; normalized error stays 1%
    assert seg.mean.translation.kitti == pytest.approx(0.0101, rel=1e-2)
    first = seg[0]
    assert first.speed == pytest.approx(10.0, rel=0.05)


def test_evaluator_write_read(tmp_path):
    ev = Evaluator()
    for i in range(5):
        ev.add_transforms("04", i * 0.1, _transform(t=(1, 0, 0)), _transform(t=(1, 0, 0)), time=2.5)
    ev.write(str(tmp_path))
    assert (tmp_path / "04.txt").exists()

    ev2 = Evaluator.read(str(tmp_path))
    assert ev2.has_sequence("04")
    assert len(ev2.get_sequence("04")) == 5
    assert ev2.get_total_step_errors().mean.time == pytest.approx(2.5)


def test_metrics_container_stats():
    data = [
        TransformationMetrics.calc(_transform(t=(e, 0, 0)), np.eye(4), time=e)
        for e in (1.0, 2.0, 3.0)
    ]
    c = MetricsContainer(data)
    assert c.mean.translation.kitti == pytest.approx(2.0)
    assert c.min.translation.kitti == pytest.approx(1.0)
    assert c.max.translation.kitti == pytest.approx(3.0)
    assert c.median.time == pytest.approx(2.0)
    assert len(c) == 3


def test_plots_render():
    ev = Evaluator()
    rng = np.random.default_rng(2)
    for i in range(120):
        ev.add_transforms(
            "00", i * 0.1,
            _transform(yaw=0.001 * rng.normal(), t=(1 + 0.01 * rng.normal(), 0, 0)),
            _transform(t=(1, 0, 0)),
        )
    assert ev.plot_sequences()["00"] is not None
    assert ev.plot_sequences_2d()["00"] is not None
    assert list(ev.plot_error_over_time().values())[0] is not None
    assert ev.plot_total_kitti_errors() is not None
    assert ev.plot_segment_error_bars() is not None


def test_load_scenario(tmp_path, monkeypatch):
    monkeypatch.setenv("KITTI_PATH", "/data/kitti")
    import os.path as osp

    scen_file = osp.join(
        osp.dirname(__file__), "..", "..", "configs", "scenarios", "kitti_04_10.yaml"
    )
    from deepclr_tpu.evaluation import load_scenario

    cfg = load_scenario(scen_file)
    assert cfg.name == "kitti_04_10"
    assert cfg.sequential is True
    assert cfg.data["04"] == "/data/kitti/odometry/04.pack"
