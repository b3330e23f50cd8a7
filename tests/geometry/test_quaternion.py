"""Quaternion / SE(3) math vs. scipy.spatial.transform golden values."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from deepclr_tpu.geometry import quaternion as quat
from deepclr_tpu.geometry import se3


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    r = Rotation.random(n, random_state=rng)
    xyzw = r.as_quat()
    wxyz = np.concatenate([xyzw[:, 3:], xyzw[:, :3]], axis=1)
    return wxyz.astype(np.float64), r


def test_qmult_matches_scipy():
    q1, r1 = _rand_quats(32, 1)
    q2, r2 = _rand_quats(32, 2)
    got = np.asarray(quat.qmult(q1, q2))
    ref = (r1 * r2).as_quat()
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
    # Quaternion double cover: compare up to sign.
    sign = np.sign(np.sum(got * ref, axis=1, keepdims=True))
    np.testing.assert_allclose(got, sign * ref, atol=1e-6)


def test_quat_to_matrix_matches_scipy():
    q, r = _rand_quats(32, 3)
    got = np.asarray(quat.quat_to_matrix(q))
    np.testing.assert_allclose(got, r.as_matrix(), atol=1e-6)


def test_matrix_to_quat_round_trip():
    q, r = _rand_quats(64, 4)
    got = np.asarray(quat.matrix_to_quat(r.as_matrix()))
    assert np.all(got[:, 0] >= 0)  # canonical sign
    m_round = np.asarray(quat.quat_to_matrix(got))
    np.testing.assert_allclose(m_round, r.as_matrix(), atol=1e-6)


def test_qrotate_matches_matrix():
    q, r = _rand_quats(16, 5)
    v = np.random.default_rng(6).normal(size=(16, 3))
    got = np.asarray(quat.qrotate(q, v))
    ref = np.einsum("nij,nj->ni", r.as_matrix(), v)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_euler_matches_scipy():
    rng = np.random.default_rng(7)
    angles = rng.uniform(-1.2, 1.2, size=(32, 3))
    got = np.asarray(se3.euler_to_matrix(angles[:, 0], angles[:, 1], angles[:, 2]))
    # static xyz == scipy extrinsic lowercase 'xyz'
    ref = Rotation.from_euler("xyz", angles).as_matrix()
    np.testing.assert_allclose(got, ref, atol=1e-6)

    roll, pitch, yaw = se3.matrix_to_euler(got)
    back = np.stack([np.asarray(roll), np.asarray(pitch), np.asarray(yaw)], axis=1)
    np.testing.assert_allclose(back, angles, atol=1e-5)


def test_transform_inverse_and_points():
    q, r = _rand_quats(8, 8)
    t = np.random.default_rng(9).normal(size=(8, 3))
    m = np.asarray(se3.make_transform(r.as_matrix(), t))
    m_inv = np.asarray(se3.transform_inverse(m))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", m, m_inv), np.broadcast_to(np.eye(4), (8, 4, 4)),
        atol=1e-6,
    )
    pts = np.random.default_rng(10).normal(size=(8, 50, 3))
    got = np.asarray(se3.transform_points(m, pts))
    ref = np.einsum("nij,nkj->nki", m[:, :3, :3], pts) + t[:, None, :]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_dualquat_round_trip():
    q, r = _rand_quats(32, 11)
    t = np.random.default_rng(12).normal(size=(32, 3)) * 5.0
    m = np.asarray(se3.make_transform(r.as_matrix(), t))
    dq = np.asarray(se3.dualquat_from_matrix(m))
    assert dq.shape == (32, 8)
    # real part unit norm, dual orthogonal to real
    np.testing.assert_allclose(np.linalg.norm(dq[:, :4], axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.sum(dq[:, :4] * dq[:, 4:], axis=1), 0.0, atol=1e-6
    )
    m_back = np.asarray(se3.dualquat_to_matrix(dq))
    np.testing.assert_allclose(m_back, m, atol=1e-5)


@pytest.mark.parametrize("label_type", ["pose3d_euler", "pose3d_quat", "pose3d_dual_quat"])
def test_label_round_trip(label_type):
    from deepclr_tpu.geometry import LabelType

    lt = LabelType.create(label_type)
    q, r = _rand_quats(16, 13)
    t = np.random.default_rng(14).normal(size=(16, 3)) * 3.0
    m = np.asarray(se3.make_transform(r.as_matrix(), t))
    label = np.asarray(lt.from_matrix(m))
    assert label.shape == (16, lt.dim)
    assert len(lt.names) == lt.dim
    m_back = np.asarray(lt.to_matrix(label))
    np.testing.assert_allclose(m_back, m, atol=1e-4)


def test_label_bias_is_identity():
    from deepclr_tpu.geometry import LabelType

    for lt in (LabelType.POSE3D_QUAT, LabelType.POSE3D_DUAL_QUAT):
        m = np.asarray(lt.to_matrix(np.array(lt.bias)))
        np.testing.assert_allclose(m, np.eye(4), atol=1e-6)
