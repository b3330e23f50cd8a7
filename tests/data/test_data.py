"""Data pipeline tests: pack store, dataflows, transforms, batching, loader."""
import numpy as np
import pytest

from deepclr_tpu.data import (
    DatasetType,
    PackReader,
    PackWriter,
    batch_samples,
    build_dataset,
    create_input_dataflow,
    pad_points,
)
from deepclr_tpu.geometry import LabelType


# --- pack store ---------------------------------------------------------------

def test_pack_round_trip(tmp_path):
    path = str(tmp_path / "test.pack")
    obj = {
        "idx": 7,
        "timestamp": 123.456,
        "pose": np.eye(4),
        "cloud": np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32),
        "name": "seq00",
        "flags": [True, None, "x", 3, 2.5],
        "nested": {"a": np.arange(5, dtype=np.int64)},
    }
    with PackWriter(path) as w:
        w.put("000000", obj)
        w.put("000001", {"idx": 8})
    with PackReader(path) as r:
        assert len(r) == 2
        assert r.keys == ["000000", "000001"]
        got = r["000000"]
        assert got["idx"] == 7
        assert got["timestamp"] == pytest.approx(123.456)
        np.testing.assert_array_equal(got["pose"], np.eye(4))
        np.testing.assert_array_equal(got["cloud"], obj["cloud"])
        assert got["cloud"].dtype == np.float32
        assert got["name"] == "seq00"
        assert got["flags"] == [True, None, "x", 3, 2.5]
        np.testing.assert_array_equal(got["nested"]["a"], np.arange(5))


def _write_sequence_pack(path, n_frames=8, step=1.0, seed=0):
    """Per-frame records driving a straight-line trajectory."""
    rng = np.random.default_rng(seed)
    with PackWriter(str(path)) as w:
        for i in range(n_frames):
            pose = np.eye(4)
            pose[0, 3] = i * step
            w.put(f"{i:08d}", {
                "idx": i,
                "timestamp": i * 0.1e6,
                "pose": pose,
                "cloud": rng.normal(size=(50 + i, 4)).astype(np.float32),
            })


def test_kitti_sequence_dataflow(tmp_path):
    p = tmp_path / "00.pack"
    _write_sequence_pack(p)
    df = create_input_dataflow(DatasetType.KITTI_ODOMETRY_VELODYNE, str(p))
    assert len(df) == 7
    samples = list(df)
    assert len(samples) == 7
    s = samples[0]
    assert s["dataset"] == "00"
    assert s["idx"] == [0, 1]
    assert s["clouds"][0].shape == (50, 4)
    assert s["clouds"][0].dtype == np.float32
    # motion between consecutive frames: +1 m in x
    np.testing.assert_allclose(s["transform"][:3, 3], [1.0, 0, 0], atol=1e-6)
    assert s["augmentations"] == [None, None]


def test_modelnet_self_pairs(tmp_path):
    p = tmp_path / "train.pack"
    rng = np.random.default_rng(1)
    with PackWriter(str(p)) as w:
        for i in range(5):
            w.put(f"{i:06d}", {"idx": i, "cloud": rng.normal(size=(30, 6))})
    df = create_input_dataflow(DatasetType.MODELNET40, str(p))
    samples = list(df)
    assert len(samples) == 5
    np.testing.assert_array_equal(samples[0]["clouds"][0], samples[0]["clouds"][1])
    np.testing.assert_array_equal(samples[0]["transform"], np.eye(4))


def test_generic_pair_dataflow_and_mixing(tmp_path):
    rng = np.random.default_rng(2)
    for name in ("a", "b"):
        with PackWriter(str(tmp_path / f"{name}.pack")) as w:
            for i in range(4):
                w.put(f"{i:06d}", {
                    "dataset": name,
                    "idx": [i, i + 1],
                    "timestamps": [float(i), float(i + 1)],
                    "clouds": [rng.normal(size=(20, 3)), rng.normal(size=(25, 3))],
                    "transform": np.eye(4),
                })
    ds = build_dataset(
        DatasetType.GENERIC,
        [str(tmp_path / "a.pack"), str(tmp_path / "b.pack")],
        shuffle=True,
    )
    assert len(ds) == 8
    names = [s["dataset"] for s in ds]
    assert sorted(names) == ["a"] * 4 + ["b"] * 4
    # re-iterable
    assert len(list(ds)) == 8


# --- transforms ----------------------------------------------------------------

def _sample(n0=100, n1=120, d=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "dataset": "t",
        "idx": [0, 1],
        "timestamps": [0.0, 0.1],
        "clouds": [
            rng.normal(size=(n0, d)).astype(np.float32) * 5,
            rng.normal(size=(n1, d)).astype(np.float32) * 5,
        ],
        "transform": np.eye(4),
        "augmentations": [None, None],
    }


def test_systematic_erasing_and_truncate():
    from deepclr_tpu.data.transforms import SystematicErasing, TruncateDimension

    s = _sample()
    s = SystematicErasing(2)(s)
    assert s["clouds"][0].shape == (50, 4)
    s = TruncateDimension(3)(s)
    assert s["clouds"][0].shape == (50, 3)


def test_random_transform_consistency():
    """The deferred augmentation must keep the *effective* registration
    problem consistent: transform_new = transform_old @ rand, and the source
    cloud gets inv(rand) baked in."""
    from deepclr_tpu.data.transforms import ApplyAugmentations, RandomTransform

    s = _sample(d=3, seed=3)
    yaw_motion = np.eye(4)
    yaw_motion[:3, 3] = [2.0, 0, 0]
    s["transform"] = yaw_motion.copy()
    cloud1_before = s["clouds"][1].copy()

    rt = RandomTransform([0.5, 0.5, 0.5], [5.0, 5.0, 5.0],
                         rng=np.random.default_rng(4))
    s = rt(s)
    assert s["augmentations"][1] is not None
    rand = np.linalg.inv(s["augmentations"][1])
    np.testing.assert_allclose(s["transform"], yaw_motion @ rand, atol=1e-10)

    # after applying augmentation, points satisfy the *new* transform:
    # template aligned by: new_source = inv(rand) @ old_source
    s = ApplyAugmentations()(s)
    expect = cloud1_before @ np.linalg.inv(rand)[:3, :3].T + np.linalg.inv(rand)[:3, 3]
    np.testing.assert_allclose(s["clouds"][1], expect, atol=1e-5)


def test_remove_transform():
    from deepclr_tpu.data.transforms import RemoveTransform

    s = _sample(d=3)
    motion = np.eye(4)
    motion[:3, 3] = [1.0, 2.0, 3.0]
    s["transform"] = motion.copy()
    s = RemoveTransform(True)(s)
    np.testing.assert_array_equal(s["transform"], np.eye(4))
    np.testing.assert_array_equal(s["augmentations"][1], motion)


def test_range_selection_and_fps():
    from deepclr_tpu.data.transforms import FarthestPointSampling, RangeSelection

    s = _sample(d=3, seed=5)
    s["clouds"][0][:10] *= 100.0  # push some points out of range
    s = RangeSelection(0.0, 40.0)(s)
    assert s["clouds"][0].shape[0] <= 100

    s = FarthestPointSampling(16)(s)
    assert s["clouds"][0].shape == (16, 3)
    assert s["clouds"][1].shape == (16, 3)


# --- batching -------------------------------------------------------------------

def test_pad_points():
    rng = np.random.default_rng(6)
    small = rng.normal(size=(10, 4)).astype(np.float32)
    pts, mask = pad_points(small, 16)
    assert pts.shape == (16, 4) and mask.sum() == 10
    np.testing.assert_array_equal(pts[:10], small)

    big = rng.normal(size=(32, 4)).astype(np.float32)
    pts, mask = pad_points(big, 16, rng)
    assert pts.shape == (16, 4) and mask.all()


def test_batch_samples_layout():
    samples = [_sample(seed=i) for i in range(3)]
    motion = np.eye(4)
    motion[:3, 3] = [1.0, 0, 0]
    samples[0]["transform"] = motion
    batch = batch_samples(samples, LabelType.POSE3D_DUAL_QUAT, num_points=128)
    assert batch["template"].shape == (3, 128, 4)
    assert batch["source"].shape == (3, 128, 4)
    assert batch["template_mask"].shape == (3, 128)
    assert batch["template_mask"][0].sum() == 100
    assert batch["y"].shape == (3, 8)
    # label encodes the motion: dual part recovers t=[1,0,0]
    from deepclr_tpu.geometry.hostmath import label_to_matrix_np

    m = label_to_matrix_np(LabelType.POSE3D_DUAL_QUAT, batch["y"][0])
    np.testing.assert_allclose(m[:3, 3], [1.0, 0, 0], atol=1e-6)
    assert batch["d"] == ["t", "t", "t"]


def test_hostmath_matches_jax_labels():
    from deepclr_tpu.geometry.hostmath import label_from_matrix_np, label_to_matrix_np
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(7)
    r = Rotation.random(8, random_state=rng)
    m = np.broadcast_to(np.eye(4), (8, 4, 4)).copy()
    m[:, :3, :3] = r.as_matrix()
    m[:, :3, 3] = rng.normal(size=(8, 3))

    for lt in (LabelType.POSE3D_EULER, LabelType.POSE3D_QUAT, LabelType.POSE3D_DUAL_QUAT):
        np_label = label_from_matrix_np(lt, m)
        jax_label = np.asarray(lt.from_matrix(m))
        np.testing.assert_allclose(np_label, jax_label, atol=1e-5)
        back = label_to_matrix_np(lt, np_label)
        np.testing.assert_allclose(back, m, atol=1e-5)


# --- loader ----------------------------------------------------------------------

def test_data_loader_end_to_end(tmp_path):
    from deepclr_tpu.config import Mode, create_default_config, finish_config
    from deepclr_tpu.data import make_data_loader

    _write_sequence_pack(tmp_path / "00.pack", n_frames=13)

    cfg = create_default_config(Mode.TEST)
    cfg.read_dict({
        "base_dir": str(tmp_path),
        "data": {
            "training": str(tmp_path / "00.pack"),
            "validation": str(tmp_path / "00.pack"),
            "dataset_type": "kitti_odometry_velodyne",
            "sequential": True,
        },
        "data_loader": {"batch_size": 4, "num_points": 64, "num_workers": 2,
                        "buffer_size": 2},
        "model": {"input_dim": 4, "point_dim": 3,
                  "label_type": "pose3d_dual_quat", "model_type": "deepclr"},
        "transforms": {"point_noise": {"scale": 0.01}},
        "optimizer": {"max_iterations": 10},
    })
    finish_config(cfg)

    loader = make_data_loader(cfg, is_train=True)
    assert len(loader) == 3  # 12 pairs // 4
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["template"].shape == (4, 64, 4)
    assert b["y"].shape == (4, 8)
    assert b["aug_source"].shape == (4, 4, 4)
    assert len(b["d"]) == 4

    # validation loader keeps the remainder
    val_loader = make_data_loader(cfg, is_train=False)
    val_batches = list(val_loader)
    assert sum(vb["y"].shape[0] for vb in val_batches) == 12

    # process workers (spawned; the reference's ZMQ-worker analog) must
    # produce the same batch structure
    cfg.defrost()
    cfg.data_loader.worker_type = "process"
    cfg.freeze()
    proc_batches = list(make_data_loader(cfg, is_train=True))
    assert len(proc_batches) == 3
    assert proc_batches[0]["template"].shape == (4, 64, 4)


def test_data_loader_multi_host_sharding(tmp_path):
    """Per-host sample sharding: disjoint, exhaustive, stable lengths."""
    from deepclr_tpu.config import Mode, create_default_config, finish_config
    from deepclr_tpu.data.loader import DataLoader

    _write_sequence_pack(tmp_path / "00.pack", n_frames=25)

    cfg = create_default_config(Mode.TEST)
    cfg.read_dict({
        "base_dir": str(tmp_path),
        "data": {"training": str(tmp_path / "00.pack"),
                 "dataset_type": "kitti_odometry_velodyne",
                 "sequential": True},
        "data_loader": {"batch_size": 2, "num_points": 64},
        "model": {"input_dim": 4, "point_dim": 3,
                  "label_type": "pose3d_dual_quat", "model_type": "deepclr"},
        "optimizer": {"max_iterations": 10},
    })
    finish_config(cfg)

    stamps = []
    for shard in range(3):
        loader = DataLoader(cfg, is_train=False, source=cfg.data.training,
                            shard_index=shard, num_shards=3)
        shard_stamps = []
        for batch in loader:
            shard_stamps.extend(batch["t"][:, 0].tolist())
        stamps.append(set(shard_stamps))
        assert len(list(loader))  # re-iterable

    # disjoint and exhaustive over the 24 pairs
    assert stamps[0] | stamps[1] | stamps[2]
    assert not (stamps[0] & stamps[1])
    assert not (stamps[0] & stamps[2])
    total = sum(len(s) for s in stamps)
    assert total == 24


def test_data_loader_presorted_batches(tmp_path):
    """model.params.presorted drives host Morton sorting in the batcher:
    every valid cloud prefix comes out in Morton order."""
    from deepclr_tpu.config import Mode, create_default_config, finish_config
    from deepclr_tpu.data import make_data_loader
    from deepclr_tpu.ops.morton import morton_argsort_np

    _write_sequence_pack(tmp_path / "00.pack", n_frames=9)

    cfg = create_default_config(Mode.TEST)
    cfg.read_dict({
        "base_dir": str(tmp_path),
        "data": {
            "training": str(tmp_path / "00.pack"),
            "validation": str(tmp_path / "00.pack"),
            "dataset_type": "kitti_odometry_velodyne",
            "sequential": True,
        },
        "data_loader": {"batch_size": 4, "num_points": 64, "num_workers": 0},
        "model": {"input_dim": 4, "point_dim": 3,
                  "label_type": "pose3d_dual_quat", "model_type": "deepclr",
                  "params": {"presorted": True}},
        "optimizer": {"max_iterations": 10},
    })
    finish_config(cfg)

    batch = next(iter(make_data_loader(cfg, is_train=True)))
    for key, mkey in (("template", "template_mask"), ("source", "source_mask")):
        for cloud, mask in zip(batch[key], batch[mkey]):
            valid = cloud[mask]
            if len(valid) > 1:
                order = morton_argsort_np(valid)
                assert (order == np.arange(len(valid))).all()
