"""Synthetic data generators: LiDAR scan pairs and CAD surface clouds."""
import numpy as np

from deepclr_tpu.data.synthetic import (
    cad_cloud,
    lidar_pair,
    lidar_scan,
    random_motion,
)


def test_lidar_scan_shape_and_density():
    rng = np.random.default_rng(0)
    cloud = lidar_scan(rng, 16384)
    assert cloud.shape == (16384, 4)
    assert cloud.dtype == np.float32
    # KITTI-like: ground near sensor height, intensity in [0, 1]
    assert cloud[:, 2].min() > -3.0
    assert 0.0 <= cloud[:, 3].min() and cloud[:, 3].max() <= 1.0
    # dense near-sensor neighborhoods (the property the fused-SA parity
    # study needs): some 1m-balls must hold > 50 points
    idx = rng.choice(16384, 128)
    d2 = ((cloud[None, :, :3] - cloud[idx, None, :3]) ** 2).sum(-1)
    assert (d2 < 1.0).sum(1).max() > 50


def test_lidar_pair_is_registrable():
    rng = np.random.default_rng(1)
    gt = np.eye(4, dtype=np.float32)
    gt[0, 3] = 3.0  # large motion so the aligned/unaligned contrast is robust
    template, source, motion = lidar_pair(rng, 4096, motion=gt)
    aligned = source[:, :3] @ motion[:3, :3].T + motion[:3, 3]
    # compare on structure points (z above ground): the ground rings are
    # sensor-centric, so UNALIGNED scans overlay perfectly on the ground —
    # only world-anchored obstacle points discriminate alignment
    struct = np.flatnonzero(source[:, 2] > -1.2)
    sub = rng.choice(struct, 200)
    tmpl_struct = template[template[:, 2] > -1.2, :3]
    d_aligned = np.sqrt(
        ((aligned[sub, None] - tmpl_struct[None]) ** 2).sum(-1)
    ).min(1)
    d_raw = np.sqrt(
        ((source[sub, None, :3] - tmpl_struct[None]) ** 2).sum(-1)
    ).min(1)
    assert np.median(d_aligned) < 0.3
    assert np.median(d_aligned) < 0.5 * np.median(d_raw)


def test_random_motion_is_se3():
    rng = np.random.default_rng(2)
    m = random_motion(rng)
    np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])


def test_cad_cloud_normalized_with_unit_normals():
    rng = np.random.default_rng(3)
    cloud = cad_cloud(rng, 2048)
    assert cloud.shape == (2048, 6)
    r = np.linalg.norm(cloud[:, :3], axis=1)
    assert r.max() <= 1.0 + 1e-5
    n = np.linalg.norm(cloud[:, 3:], axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)
    # different draws give different shapes
    cloud2 = cad_cloud(rng, 2048)
    assert np.abs(cloud[:, :3] - cloud2[:, :3]).max() > 0.1
