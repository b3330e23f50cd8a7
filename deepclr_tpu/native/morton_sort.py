"""ctypes binding for the native Morton row sort (native/morton_sort.cpp).

The data pipeline's pad-time presort (``pad_points(morton=True)``) is the
hottest host-side op for ``presorted`` models: 2.43 ms per 16k-pt cloud in
numpy (key build + stable argsort + fancy-index gather) vs ~0.15 ms in the
native radix-sort path — bit-identical permutation (same double-precision
quantization; stable LSD radix == numpy stable argsort).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["morton_sort_rows_native", "native_morton_available"]

_lib: Optional[ctypes.CDLL] = None
_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get("DEEPCLR_NATIVE_PAD", "1") == "0":
        return None
    try:
        from . import load_library

        lib = load_library("morton_sort")
        lib.morton_sort_rows.restype = ctypes.c_long
        lib.morton_sort_rows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:  # no g++ / build failure -> numpy fallback
        _lib = None
    return _lib


def native_morton_available() -> bool:
    return _load() is not None


def morton_sort_rows_native(cloud: np.ndarray,
                            out: Optional[np.ndarray] = None) -> np.ndarray:
    """Morton-sort the rows of an (N, D>=3) float32 cloud.

    Writes into ``out`` (N, D) float32 when given (must be C-contiguous and
    must not alias ``cloud``), else allocates. Bit-identical to
    ``cloud[morton_argsort_np(cloud)]``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native morton_sort library unavailable")
    cloud = np.ascontiguousarray(cloud, np.float32)
    n, d = cloud.shape
    if out is None:
        out = np.empty((n, d), np.float32)
    rc = lib.morton_sort_rows(
        cloud.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"morton_sort_rows failed (rc={rc})")
    return out
