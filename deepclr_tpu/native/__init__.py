"""Native (C++) runtime components and their ctypes bindings.

The reference framework carries three native extension packages
(pointnet2 CUDA, gicp C++, kitti_devkit C++ — SURVEY §2.1).  Here the
compute kernels are Pallas/XLA; the host-side native pieces live in
``native/``:

  * kitti_devkit.cpp — KITTI odometry benchmark evaluator,
  * pack_reader.cpp  — mmap .pack store reader (zero-copy record access),
  * morton_sort.cpp  — pad-time Morton presort (bit-identical stable
    radix sort; the hottest host op for ``presorted`` models).

Libraries are built on demand with g++ into native/build/ and cached; the
standalone binaries can also be built via native/Makefile.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

__all__ = ["build_library", "load_library", "kitti_devkit_eval"]

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.realpath(__file__)))),
                       "native")
_BUILD_DIR = osp.join(_NATIVE_DIR, "build")


def build_library(name: str, force: bool = False) -> str:
    """Compile native/{name}.cpp into a cached shared library; returns path."""
    src = osp.join(_NATIVE_DIR, f"{name}.cpp")
    out = osp.join(_BUILD_DIR, f"lib{name}.so")
    if not force and osp.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    subprocess.check_call([
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out,
    ])
    return out


_loaded = {}


def load_library(name: str) -> ctypes.CDLL:
    if name not in _loaded:
        _loaded[name] = ctypes.CDLL(build_library(name))
    return _loaded[name]


def kitti_devkit_eval(gt_dir: str, pred_dir: str,
                      result_dir: Optional[str] = None) -> int:
    """Run the native KITTI odometry evaluator.

    Mirrors the reference binding `kitti_devkit_.eval(gt_dir, pred_dir)`
    (extern/kitti_devkit/kitti_devkit_binding.cpp:8-11): evaluates every
    sequence present in both directories and writes error tables + stats
    into ``result_dir`` (default: pred_dir/result).  Returns the number of
    evaluated sequences.
    """
    lib = load_library("kitti_devkit")
    lib.kitti_eval.restype = ctypes.c_int
    lib.kitti_eval.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                               ctypes.c_char_p]
    result_dir = result_dir or osp.join(pred_dir, "result")
    n = lib.kitti_eval(gt_dir.encode(), pred_dir.encode(),
                       result_dir.encode())
    if n < 0:
        raise RuntimeError("kitti_devkit evaluation failed")
    return n
