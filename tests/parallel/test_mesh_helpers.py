"""Unit tests for mesh helper invariants (r5 advisor items).

allgather_host pairs process_allgather rows with mesh device order — valid
only for process-major meshes; float64 stamps must survive the device
collective bit-exactly (jax x64 is disabled by default).
"""
import numpy as np
import pytest

from deepclr_tpu.parallel.mesh import (
    _check_process_major, allgather_host_f64, make_mesh,
)


class _Dev:
    def __init__(self, process_index):
        self.process_index = process_index

    def __repr__(self):
        return f"_Dev(p{self.process_index})"


def test_process_major_ok():
    _check_process_major([_Dev(0), _Dev(0), _Dev(1), _Dev(1)])


def test_process_major_violation_raises():
    with pytest.raises(AssertionError, match="process-major"):
        _check_process_major([_Dev(0), _Dev(1), _Dev(0), _Dev(1)])


def test_make_mesh_checks_order():
    # real devices from jax.devices() are process-major — must not raise
    make_mesh()


def test_allgather_f64_single_process_bit_exact():
    # epoch-style timestamps: float32 would quantize to ~128 s here
    vals = np.asarray([1.6e9 + 0.001, 1.6e9 + 0.002], dtype=np.float64)
    out = allgather_host_f64(vals)
    assert out.dtype == np.float64
    np.testing.assert_array_equal(out, vals)
