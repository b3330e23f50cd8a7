"""Pallas FPS kernel (interpret mode) vs the XLA reference implementation."""
import numpy as np
import pytest

from deepclr_tpu.ops.fps import furthest_point_sample_xla


def _pallas_fps_interpret(xyz, npoint, mask=None):
    """Run the kernel in interpreter mode (patch pallas_call interpret)."""
    from unittest import mock
    from jax.experimental import pallas as pl

    import deepclr_tpu.ops.pallas.fps_kernel as fk

    real_call = pl.pallas_call

    def fake_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    with mock.patch.object(fk.pl, "pallas_call", fake_call):
        return fk.furthest_point_sample_pallas(xyz, npoint, mask=mask)


@pytest.mark.parametrize("use_mask", [False, True])
def test_fps_kernel_matches_xla(use_mask):
    rng = np.random.default_rng(0)
    b, n, p = 2, 256, 32
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32) * 5.0
    mask = None
    if use_mask:
        mask = np.ones((b, n), bool)
        mask[0, 200:] = False
    ref = np.asarray(furthest_point_sample_xla(xyz, p, mask=mask))
    got = np.asarray(_pallas_fps_interpret(xyz, p, mask=mask))
    np.testing.assert_array_equal(got, ref)


def test_fps_kernel_batch_chunking_exact():
    """Batches beyond one call's VMEM residency are sliced; FPS is
    independent per cloud so the sliced result must be identical."""
    from unittest import mock

    import deepclr_tpu.ops.pallas.fps_kernel as fk

    rng = np.random.default_rng(1)
    b, n, p = 12, 256, 16
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32) * 5.0
    mask = np.ones((b, n), bool)
    mask[3, 180:] = False

    whole = np.asarray(_pallas_fps_interpret(xyz, p, mask=mask))
    with mock.patch.object(fk, "_max_clouds_per_call", return_value=5):
        sliced = np.asarray(_pallas_fps_interpret(xyz, p, mask=mask))
    np.testing.assert_array_equal(sliced, whole)
    ref = np.asarray(furthest_point_sample_xla(xyz, p, mask=mask))
    np.testing.assert_array_equal(sliced, ref)
