"""ICP baselines: recover a known rigid transform on synthetic clouds
(extends the reference tests/icp/test_icp.py smoke test with accuracy
assertions)."""
import numpy as np
import pytest

from deepclr_tpu.icp import ICPAlgorithm, ICPRegistration


def _make_cloud(n=512, seed=0):
    rng = np.random.default_rng(seed)
    # structured surface-ish cloud (plane + curvature) so normals make sense
    xy = rng.uniform(-5, 5, size=(n, 2))
    z = 0.3 * np.sin(xy[:, 0]) + 0.2 * np.cos(1.3 * xy[:, 1])
    return np.column_stack([xy, z]).astype(np.float32)


def _transform(yaw_deg=2.0, t=(0.1, -0.05, 0.02)):
    yaw = np.deg2rad(yaw_deg)
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = t
    return m


@pytest.mark.parametrize("algorithm", list(ICPAlgorithm))
def test_icp_returns_se3(algorithm):
    cloud = _make_cloud(128, seed=1)
    reg = ICPRegistration(algorithm, max_distance=5.0, max_iterations=10)
    template = reg.prepare(cloud)
    source = reg.prepare(cloud + 0.02)
    m = reg.register(template, source)
    assert m.shape == (4, 4)
    rtr = m[:3, :3] @ m[:3, :3].T
    np.testing.assert_allclose(rtr, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-6)


@pytest.mark.parametrize("algorithm", list(ICPAlgorithm))
def test_icp_recovers_transform(algorithm):
    cloud = _make_cloud(768, seed=2)
    gt = _transform()
    # source = gt applied to template; register(source->template) returns
    # inv(gt) ... align source onto template
    source_cloud = cloud @ gt[:3, :3].T + gt[:3, 3]

    reg = ICPRegistration(algorithm, max_distance=2.0, max_iterations=30)
    template = reg.prepare(cloud)
    source = reg.prepare(source_cloud)
    m = reg.register(template, source)

    aligned = source_cloud @ m[:3, :3].T + m[:3, 3]
    err = np.linalg.norm(aligned - cloud, axis=1).mean()
    assert err < 0.05, f"{algorithm}: mean alignment error {err}"


@pytest.mark.parametrize("algorithm", list(ICPAlgorithm))
def test_icp_converges_before_iteration_cap(algorithm):
    """The epsilon gate must stop the loop well before max_iterations on an
    easy problem, and report a final update magnitude below epsilon."""
    cloud = _make_cloud(768, seed=3)
    gt = _transform(yaw_deg=1.0, t=(0.05, 0.02, -0.01))
    source_cloud = cloud @ gt[:3, :3].T + gt[:3, 3]

    reg = ICPRegistration(algorithm, max_distance=2.0, max_iterations=100,
                          epsilon=1e-3)
    m, info = reg.register(
        reg.prepare(cloud), reg.prepare(source_cloud), return_info=True
    )
    assert info["iterations"] < 100, info
    assert info["final_delta"] < 1e-3, info
    aligned = source_cloud @ m[:3, :3].T + m[:3, 3]
    assert np.linalg.norm(aligned - cloud, axis=1).mean() < 0.05


@pytest.mark.parametrize("algorithm", list(ICPAlgorithm))
def test_icp_realistic_lidar_offset(algorithm):
    """KITTI-scale accuracy: a synthetic HDL-64-style scan pair with a
    realistic frame-to-frame motion (~1 m forward, ~2 deg yaw) must be
    registered to centimeter translation / sub-0.5-degree rotation."""
    from deepclr_tpu.data.synthetic import lidar_pair

    rng = np.random.default_rng(7)
    gt = _transform(yaw_deg=2.0, t=(1.0, 0.1, 0.02))
    template, source, _ = lidar_pair(
        rng, 4096, motion=gt.astype(np.float32), noise=0.01
    )

    reg = ICPRegistration(algorithm, max_distance=2.0, max_iterations=100)
    m, info = reg.register(
        reg.prepare(template[:, :3]), reg.prepare(source[:, :3]),
        return_info=True,
    )
    t_err = np.linalg.norm(m[:3, 3] - gt[:3, 3])
    cos = np.clip((np.trace(m[:3, :3] @ gt[:3, :3].T) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(cos))
    # point-to-point slides along the dominant ground plane when the two
    # scans' ring patterns differ (well-known p2p weakness on LiDAR); the
    # plane-aware variants must hit the tight bound
    t_bound = 0.35 if algorithm == ICPAlgorithm.ICP_PO2PO else 0.10
    assert t_err < t_bound, f"{algorithm}: translation error {t_err:.3f} m {info}"
    assert r_err < 0.5, f"{algorithm}: rotation error {r_err:.3f} deg {info}"


def test_gicp_survives_indefinite_covariance():
    """TPU f32 eigh can return slightly non-orthonormal eigenvectors, so
    regularized covariances are occasionally indefinite; cholesky then
    NaNs and 0 * NaN would poison the normal equations even for pairs the
    distance gate excludes (found by the r5 sequence-scale ICP study:
    42/597 NaN registrations).  Inject an indefinite covariance and
    assert the result stays finite and accurate."""
    import jax.numpy as jnp

    cloud = _make_cloud(256, seed=7)
    m_true = _transform(1.0, (0.2, 0.1, 0.0))
    src = (cloud @ m_true[:3, :3].T + m_true[:3, 3]).astype(np.float32)

    reg = ICPRegistration(ICPAlgorithm.GICP, max_distance=5.0,
                          max_iterations=30)
    t = reg.prepare(cloud)
    s = reg.prepare(src)
    # make a handful of template covariances indefinite (min eig -5e-4,
    # the magnitude observed on hardware)
    bad = np.array(t["cov"])  # writable copy
    for i in range(0, 12):
        bad[i] = np.diag([1.0, 1.0, -5e-4])
    t["cov"] = jnp.asarray(bad)

    m = reg.register(t, s)
    assert np.isfinite(m).all()
    # still recovers the inverse transform (source -> template frame)
    err = np.linalg.inv(m_true) @ np.linalg.inv(m)
    assert np.abs(err - np.eye(4)).max() < 0.05
