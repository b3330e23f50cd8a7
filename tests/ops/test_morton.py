"""Morton sorting: key locality + set invariance of the fused SA output."""
import jax.numpy as jnp
import numpy as np

from deepclr_tpu.ops.morton import morton_code, spatial_sort


def test_morton_sort_moves_invalid_last_and_keeps_sets():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32) * 10
    feat = rng.normal(size=(2, 64, 2)).astype(np.float32)
    mask = np.ones((2, 64), bool)
    mask[0, 50:] = False

    sx, sf, sm, order = spatial_sort(
        jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(mask)
    )
    sm = np.asarray(sm)
    # invalid points sorted to the end
    assert sm[0, :50].all() and not sm[0, 50:].any()
    # same point sets (rows permuted together)
    for b in range(2):
        a = np.concatenate([xyz[b], feat[b]], -1)
        s = np.concatenate([np.asarray(sx)[b], np.asarray(sf)[b]], -1)
        np.testing.assert_allclose(
            np.sort(a.round(5), axis=0), np.sort(s.round(5), axis=0), atol=1e-5
        )


def test_morton_sort_return_order_is_permutation():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(1, 32, 3)).astype(np.float32)
    sx, _, _, order = spatial_sort(jnp.asarray(xyz), return_order=True)
    order = np.asarray(order)
    assert sorted(order[0].tolist()) == list(range(32))
    np.testing.assert_allclose(np.asarray(sx)[0], xyz[0][order[0]], atol=0)


def test_morton_codes_are_spatially_local():
    # points on a line: morton order along the line must be monotone-ish;
    # check adjacent-in-code points are adjacent in space on a grid
    g = np.stack(np.meshgrid(np.arange(8.0), np.arange(8.0), [0.0]), -1)
    pts = g.reshape(1, -1, 3).astype(np.float32)
    codes = np.asarray(morton_code(jnp.asarray(pts)))[0]
    order = np.argsort(codes)
    sorted_pts = pts[0][order]
    steps = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1)
    # z-order curve: mean step is small relative to the 10-unit diameter
    assert steps.mean() < 2.0


def test_host_morton_argsort_matches_device_codes():
    """morton_argsort_np orders by the same cubic-cell codes the device
    computes: device codes of a host-sorted cloud are non-decreasing (up to
    float32-vs-float64 quantization at cell edges: allow <1% inversions)."""
    from deepclr_tpu.ops.morton import morton_argsort_np

    rng = np.random.default_rng(3)
    xyz = (rng.normal(size=(2048, 3)) * [30.0, 30.0, 2.0]).astype(np.float32)
    srt = xyz[morton_argsort_np(xyz)]
    codes = np.asarray(morton_code(jnp.asarray(srt[None]))[0]).astype(np.int64)
    inversions = np.sum(np.diff(codes) < 0)
    assert inversions <= len(codes) // 100


def test_pad_points_morton_preserves_sets_and_padding():
    from deepclr_tpu.data.batching import pad_points
    from deepclr_tpu.ops.morton import morton_argsort_np

    rng = np.random.default_rng(4)
    cloud = rng.normal(size=(100, 4)).astype(np.float32) * 5

    # pad path: valid prefix sorted, zero pad last
    out, mask = pad_points(cloud, 128, rng, morton=True)
    assert mask[:100].all() and not mask[100:].any()
    assert (out[100:] == 0).all()
    np.testing.assert_allclose(np.sort(out[:100], axis=0),
                               np.sort(cloud, axis=0), atol=0)
    order = morton_argsort_np(out[:100])
    assert (order == np.arange(100)).all()  # already in Morton order

    # subsample path: subset of the original, sorted
    out2, mask2 = pad_points(cloud, 64, np.random.default_rng(5), morton=True)
    assert mask2.all()
    rows = {tuple(r) for r in cloud.round(5).tolist()}
    assert all(tuple(r) in rows for r in out2.round(5).tolist())
    assert (morton_argsort_np(out2) == np.arange(64)).all()


def test_presorted_model_forward_matches_unsorted_exact_semantics():
    """A presorted=True model given host-sorted input computes the same
    fused SA result as presorted=False given the identical (already
    sorted) input — the device re-sort of a Morton-ordered cloud is a
    no-op permutation-wise for the set semantics."""
    import jax

    from deepclr_tpu.models.pointnet2 import SetAbstractionMSG
    from deepclr_tpu.ops.morton import morton_argsort_np

    rng = np.random.default_rng(6)
    xyz_np = (rng.normal(size=(1, 4096, 3)) * [20.0, 20.0, 2.0]).astype(np.float32)
    xyz_np = xyz_np[:, morton_argsort_np(xyz_np[0])]
    xyz = jnp.asarray(xyz_np)

    kw = dict(npoint=64, radii=(0.8,), nsamples=(32,), mlps=((8, 16),))
    m_pre = SetAbstractionMSG(**kw, presorted=True)
    m_dev = SetAbstractionMSG(**kw, presorted=False)
    v = m_pre.init(jax.random.PRNGKey(0), xyz)
    out_pre = m_pre.apply(v, xyz)
    out_dev = m_dev.apply(v, xyz)
    for a, b in zip(jax.tree_util.tree_leaves(out_pre),
                    jax.tree_util.tree_leaves(out_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
