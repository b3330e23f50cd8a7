"""Import the reference's own torch math modules for numeric parity tests.

The reference tree at /root/reference is runnable CPU torch code for its
math layers (losses, quaternions, layer helpers, LR schedulers) — only its
*native* dependencies (pointnet2 CUDA, gicp) and data-pipeline packages
(tensorpack dataflow, lmdb, pykitti, torchvision, ignite, ranger,
torchgeometry, transforms3d) are absent from this environment.  Those are
stubbed with inert placeholder modules so the import chains resolve; every
placeholder class raises on instantiation, so a test can never silently
exercise a stub instead of real reference code.

Entry order matters: the reference package has an internal import circle
(utils.metrics -> config -> models -> models.deepclr -> utils.metrics)
that resolves only when ``deepclr.config`` is imported first — the same
order its own scripts use.
"""
from __future__ import annotations

import os.path as osp
import sys
import types

import pytest

REFERENCE = "/root/reference"

_PACKAGES = (
    "dataflow", "transforms3d", "torchvision", "pykitti", "ignite",
    "torch_cluster", "pointnet2", "tensorboardX", "ranger",
)
_MODULES = (
    "dataflow.dataflow", "dataflow.utils", "dataflow.serialize",
    "transforms3d.quaternions", "transforms3d.euler", "transforms3d.affines",
    "lmdb", "torchvision.transforms", "zmq",
    "ignite.engine", "ignite.handlers", "ignite.metrics", "ignite._utils",
    "torchgeometry", "ranger.ranger2020",
)


def _stub(name: str, package: bool = False) -> None:
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    if package:
        m.__path__ = []

    def _ga(attr, _n=name, _m=m):
        if attr.startswith("__"):
            raise AttributeError(attr)
        sub = sys.modules.get(f"{_n}.{attr}")
        if sub is not None:
            return sub

        def _boom(self, *args, **kw):
            raise RuntimeError(f"reference-parity stub {_n}.{attr} "
                               f"instantiated — a test is exercising a stub")

        cls = type(attr, (object,), {"__init__": _boom})
        setattr(_m, attr, cls)
        return cls

    m.__getattr__ = _ga
    sys.modules[name] = m


@pytest.fixture(scope="session")
def ref():
    """Namespace of imported reference modules (skips when unavailable)."""
    if not osp.isdir(osp.join(REFERENCE, "deepclr")):
        pytest.skip("reference tree not available")
    pytest.importorskip("torch")

    for name in _PACKAGES:
        _stub(name, package=True)
    for name in _MODULES:
        _stub(name)
    # transforms3d gets a FUNCTIONAL shim (standard math, not a stub) so the
    # reference's evaluation metrics and label conversions actually run.
    from . import _t3d_shim
    _t3d_shim.install()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import importlib

    importlib.import_module("deepclr.config")  # untangles the import circle
    import deepclr.evaluation.metrics as eval_metrics
    import deepclr.models.helper as helper
    import deepclr.solver.schedulers as schedulers
    import deepclr.utils.metrics as metrics
    import deepclr.utils.quaternion as quaternion
    from deepclr.data.labels import LabelType

    ns = types.SimpleNamespace(
        metrics=metrics,
        eval_metrics=eval_metrics,
        quaternion=quaternion,
        helper=helper,
        schedulers=schedulers,
        LabelType=LabelType,
    )
    return ns
