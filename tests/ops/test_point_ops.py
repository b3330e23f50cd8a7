"""Golden-value tests: point ops vs. O(n²) numpy reference implementations."""
import jax
import numpy as np
import pytest

from deepclr_tpu import ops


def _clouds(b=3, n=200, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, n, 3)).astype(np.float32) * scale


# --- numpy reference implementations (mirror the CUDA kernel semantics) ----

def np_fps(xyz, npoint, mask=None):
    b, n, _ = xyz.shape
    if mask is None:
        mask = np.ones((b, n), bool)
    out = np.zeros((b, npoint), np.int64)
    for bi in range(b):
        valid = mask[bi]
        dists = np.where(valid, 1e10, -1.0)
        last = int(np.argmax(valid))
        out[bi, 0] = last
        for i in range(1, npoint):
            d = np.sum((xyz[bi] - xyz[bi, last]) ** 2, axis=1)
            dists = np.minimum(dists, np.where(valid, d, -1.0))
            last = int(np.argmax(dists))
            out[bi, i] = last
    return out


def np_ball_query(xyz, new_xyz, radius, nsample, mask=None):
    b, n, _ = xyz.shape
    p = new_xyz.shape[1]
    if mask is None:
        mask = np.ones((b, n), bool)
    out = np.zeros((b, p, nsample), np.int64)
    for bi in range(b):
        for pi in range(p):
            cnt = 0
            for j in range(n):
                if not mask[bi, j]:
                    continue
                d2 = np.sum((xyz[bi, j] - new_xyz[bi, pi]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        out[bi, pi, :] = j
                    out[bi, pi, cnt] = j
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


def np_knn(query, points, k, points_mask=None):
    b, q, _ = query.shape
    n = points.shape[1]
    if points_mask is None:
        points_mask = np.ones((b, n), bool)
    idx = np.zeros((b, q, k), np.int64)
    for bi in range(b):
        d2 = np.sum((query[bi][:, None] - points[bi][None]) ** 2, axis=2)
        d2[:, ~points_mask[bi]] = np.inf
        idx[bi] = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx


# --- tests ------------------------------------------------------------------

def test_pairwise_sqdist():
    a = _clouds(2, 50, 1)
    b = _clouds(2, 70, 2)
    got = np.asarray(ops.pairwise_sqdist(a, b))
    ref = np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-3)


@pytest.mark.parametrize("use_mask", [False, True])
def test_fps_matches_reference(use_mask):
    xyz = _clouds(2, 128, 3)
    mask = None
    if use_mask:
        mask = np.ones((2, 128), bool)
        mask[0, 100:] = False
        mask[1, 60:] = False
    got = np.asarray(ops.furthest_point_sample(xyz, 32, mask=mask))
    ref = np_fps(xyz, 32, mask)
    np.testing.assert_array_equal(got, ref)
    if use_mask:
        valid_counts = mask.sum(axis=1)
        for bi in range(2):
            assert np.all(got[bi] < valid_counts[bi])


def test_fps_more_samples_than_valid_points():
    xyz = _clouds(1, 64, 4)
    mask = np.zeros((1, 64), bool)
    mask[0, :10] = True
    got = np.asarray(ops.furthest_point_sample(xyz, 16, mask=mask))
    assert np.all(got < 10)  # never selects padding


@pytest.mark.parametrize("use_mask", [False, True])
def test_ball_query_matches_reference(use_mask):
    xyz = _clouds(2, 150, 5, scale=1.0)
    centers_idx = np_fps(xyz, 16)
    new_xyz = np.take_along_axis(xyz, centers_idx[..., None], axis=1)
    mask = None
    if use_mask:
        mask = np.ones((2, 150), bool)
        mask[0, 120:] = False
    got = np.asarray(ops.ball_query(xyz, new_xyz, 0.5, 8, mask=mask))
    ref = np_ball_query(xyz, new_xyz, 0.5, 8, mask)
    np.testing.assert_array_equal(got, ref)


def test_ball_query_empty_ball_returns_zeros():
    xyz = np.ones((1, 10, 3), np.float32) * 100.0
    new_xyz = np.zeros((1, 2, 3), np.float32)
    got = np.asarray(ops.ball_query(xyz, new_xyz, 0.5, 4))
    np.testing.assert_array_equal(got, 0)


def test_knn_smallk_sweep_matches_topk():
    """The k<=32 argmin-sweep path must select exactly what top_k selects
    (same indices: both resolve ties to the lowest index)."""
    query = _clouds(2, 64, 11)
    points = _clouds(2, 128, 12)
    idx_sweep, d_sweep = ops.knn(query, points, 20)  # sweep path
    neg, idx_topk = jax.lax.top_k(-ops.pairwise_sqdist(query, points), 20)
    np.testing.assert_array_equal(np.asarray(idx_sweep), np.asarray(idx_topk))
    # distances recomputed in separately-jitted graphs: fusion changes rounding
    np.testing.assert_allclose(np.asarray(d_sweep), -np.asarray(neg),
                               rtol=1e-4, atol=1e-5)


def test_knn_largek_fallback():
    query = _clouds(1, 40, 13)
    points = _clouds(1, 80, 14)
    idx, d2 = ops.knn(query, points, 40)  # > _SMALLK_MAX -> top_k path
    assert idx.shape == (1, 40, 40)
    ref = np_knn(query, points, 40)
    np.testing.assert_array_equal(np.asarray(idx), ref)


@pytest.mark.parametrize("use_mask", [False, True])
def test_knn_matches_reference(use_mask):
    query = _clouds(2, 60, 6)
    points = _clouds(2, 90, 7)
    mask = None
    if use_mask:
        mask = np.ones((2, 90), bool)
        mask[1, 50:] = False
    idx, d2 = ops.knn(query, points, 5, points_mask=mask)
    idx = np.asarray(idx)
    ref = np_knn(query, points, 5, mask)
    # Distances must match exactly per rank (indices may differ on ties).
    ref_d = np.sum(
        (query[:, :, None] - np.take_along_axis(points[:, None], ref[..., None], axis=2)) ** 2,
        axis=-1,
    )
    got_d = np.sum(
        (query[:, :, None] - np.take_along_axis(points[:, None], idx[..., None], axis=2)) ** 2,
        axis=-1,
    )
    np.testing.assert_allclose(got_d, ref_d, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d2), ref_d, atol=1e-3)
    if use_mask:
        assert np.all(idx[1] < 50)


def test_gather_and_group():
    pts = _clouds(2, 40, 8)
    idx = np.random.default_rng(9).integers(0, 40, size=(2, 7)).astype(np.int32)
    got = np.asarray(ops.gather_points(pts, idx))
    ref = np.take_along_axis(pts, idx[..., None].astype(np.int64), axis=1)
    np.testing.assert_allclose(got, ref)

    gidx = np.random.default_rng(10).integers(0, 40, size=(2, 7, 4)).astype(np.int32)
    got_g = np.asarray(ops.group_points(pts, gidx))
    assert got_g.shape == (2, 7, 4, 3)
    for bi in range(2):
        for pi in range(7):
            np.testing.assert_allclose(got_g[bi, pi], pts[bi, gidx[bi, pi]])


def test_three_nn_interpolate():
    unknown = _clouds(2, 30, 11)
    known = _clouds(2, 12, 12)
    feats = _clouds(2, 12, 13)  # any (B, M, C)
    dist, idx = ops.three_nn(unknown, known)
    assert dist.shape == (2, 30, 3) and idx.shape == (2, 30, 3)
    from deepclr_tpu.ops.interpolate import three_interpolate_weights

    w = three_interpolate_weights(dist)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    out = ops.three_interpolate(feats, idx, w)
    assert out.shape == (2, 30, 3)
    # coincidence check: interpolating at known locations ~returns feats
    # (fp error in the matmul-form distances leaves ~1e-3 self-distances,
    # so the inverse-distance weights are not exactly one-hot)
    dist2, idx2 = ops.three_nn(known, known)
    w2 = three_interpolate_weights(dist2)
    out2 = np.asarray(ops.three_interpolate(feats, idx2, w2))
    np.testing.assert_allclose(out2, feats, atol=5e-2)


def test_group_points_gradient_flows():
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(_clouds(1, 20, 14))
    idx = jnp.asarray(
        np.random.default_rng(15).integers(0, 20, size=(1, 5, 3)).astype(np.int32)
    )

    def f(p):
        return jnp.sum(ops.group_points(p, idx) ** 2)

    g = jax.grad(f)(pts)
    assert g.shape == pts.shape
    assert np.isfinite(np.asarray(g)).all()
