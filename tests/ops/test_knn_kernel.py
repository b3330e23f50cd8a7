"""Pallas kNN kernel (interpret mode) vs the XLA top_k implementation."""
import numpy as np
import pytest

from deepclr_tpu.ops.knn import knn_xla
from deepclr_tpu.ops.pallas.knn_kernel import knn_pallas


@pytest.mark.parametrize("use_mask", [False, True])
def test_knn_kernel_matches_xla(use_mask):
    rng = np.random.default_rng(0)
    b, q, n, k = 2, 64, 128, 5
    query = rng.normal(size=(b, q, 3)).astype(np.float32) * 3
    points = rng.normal(size=(b, n, 3)).astype(np.float32) * 3
    mask = None
    if use_mask:
        mask = np.ones((b, n), bool)
        mask[0, 100:] = False

    ref_idx, ref_d = knn_xla(query, points, k, points_mask=mask)
    got_idx, got_d = knn_pallas(query, points, k, points_mask=mask,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               atol=1e-3)
    # indices equal where distances are non-degenerate
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    if use_mask:
        assert np.all(np.asarray(got_idx)[0] < 100)
