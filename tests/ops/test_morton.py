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
