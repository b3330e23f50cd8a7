"""Cross-validation of the jax GICP / po2pl against an independent host
implementation of the same algorithms (tests/icp/reference_gicp.py —
brute-force NN + scipy BFGS, mirroring the semantics of the reference's
gicp binding, /root/reference/extern/gicp/gicp_binding.cpp:33-70).

The two implementations share no code and use different optimizers
(Gauss-Newton on TPU vs BFGS on host), so agreement of the final
transforms on synthetic LiDAR-like pairs validates the jax numerics as an
implementation of Segal's algorithm, not merely as self-consistent.
"""
import numpy as np
import pytest

from deepclr_tpu.icp import ICPAlgorithm, ICPRegistration

from .reference_gicp import reference_gicp, reference_po2pl


def _surface_cloud(n, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "wave":
        xy = rng.uniform(-6, 6, size=(n, 2))
        z = 0.4 * np.sin(0.8 * xy[:, 0]) + 0.3 * np.cos(1.1 * xy[:, 1])
    elif kind == "bowl":
        xy = rng.uniform(-4, 4, size=(n, 2))
        z = 0.05 * (xy ** 2).sum(-1)
    else:  # ridges
        xy = rng.uniform(-5, 5, size=(n, 2))
        z = 0.5 * np.abs(np.sin(0.6 * xy[:, 0])) + 0.1 * xy[:, 1]
    return np.column_stack([xy, z]).astype(np.float32)


def _gt(yaw_deg, t):
    yaw = np.deg2rad(yaw_deg)
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = t
    return m


def _rot_angle_deg(R):
    tr = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(tr))


CASES = [
    ("wave", 10, 2.0, (0.15, -0.05, 0.02)),
    ("bowl", 11, -1.5, (-0.10, 0.08, -0.03)),
    ("ridges", 12, 1.0, (0.20, 0.10, 0.00)),
]


@pytest.mark.parametrize("kind,seed,yaw,t", CASES)
def test_gicp_matches_independent_reference(kind, seed, yaw, t):
    cloud = _surface_cloud(512, seed, kind)
    gt = _gt(yaw, t)
    source = cloud @ gt[:3, :3].T + gt[:3, 3]

    reg = ICPRegistration(ICPAlgorithm.GICP, max_distance=2.0,
                          max_iterations=100, epsilon=1e-3)
    m_jax = reg.register(reg.prepare(cloud), reg.prepare(source))
    m_ref = reference_gicp(cloud, source, max_distance=2.0)

    # both must undo the ground-truth motion...
    for m, tag in ((m_jax, "jax"), (m_ref, "ref")):
        residual = m @ gt
        assert _rot_angle_deg(residual[:3, :3]) < 0.25, tag
        assert np.linalg.norm(residual[:3, 3]) < 0.05, tag

    # ...and agree with each other (different optimizers, same algorithm)
    dm = m_jax @ np.linalg.inv(m_ref)
    assert _rot_angle_deg(dm[:3, :3]) < 0.2
    assert np.linalg.norm(dm[:3, 3]) < 0.03


@pytest.mark.parametrize("kind,seed,yaw,t", CASES[:2])
def test_po2pl_matches_independent_reference(kind, seed, yaw, t):
    cloud = _surface_cloud(512, seed + 100, kind)
    gt = _gt(yaw, t)
    source = cloud @ gt[:3, :3].T + gt[:3, 3]

    reg = ICPRegistration(ICPAlgorithm.ICP_PO2PL, max_distance=2.0,
                          max_iterations=100, epsilon=1e-3)
    m_jax = reg.register(reg.prepare(cloud), reg.prepare(source))
    m_ref = reference_po2pl(cloud, source, max_distance=2.0)

    for m, tag in ((m_jax, "jax"), (m_ref, "ref")):
        residual = m @ gt
        assert _rot_angle_deg(residual[:3, :3]) < 0.3, tag
        assert np.linalg.norm(residual[:3, 3]) < 0.06, tag

    dm = m_jax @ np.linalg.inv(m_ref)
    assert _rot_angle_deg(dm[:3, :3]) < 0.25
    assert np.linalg.norm(dm[:3, 3]) < 0.04
