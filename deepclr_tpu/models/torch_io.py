"""Dependency-free reader/writer for the PyTorch zipfile checkpoint format.

The reference ships its weights as ``torch.save`` archives
(``models/*/weights.tar``, written by /root/reference/deepclr/utils/
checkpoint.py:20-74 and loaded by /root/reference/deepclr/models/build.py:
44-49).  This module implements that on-disk format directly — a zip
archive holding ``<root>/data.pkl`` (a pickle whose tensors are persistent
-id references) plus one raw little-endian buffer per storage under
``<root>/data/<key>`` — so checkpoints can be read *and produced* without
torch installed.  Interop is pinned by tests against the real
``torch.save``/``torch.load`` when torch is available
(tests/model/test_torch_io.py).

Reader scope: flat or nested containers (dict/list/tuple/OrderedDict) of
tensors and plain scalars, i.e. state dicts and the reference's
CheckpointData. Writer scope: a flat ``{name: ndarray}`` state dict — what
``weights.tar`` holds.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

__all__ = ["read_torch_checkpoint", "write_torch_checkpoint"]

try:  # bfloat16 arrays without torch (ml_dtypes ships with jax)
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

# torch storage class name <-> numpy dtype (little-endian on disk)
_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16

_DTYPE_STORAGE = {np.dtype(v.str.lstrip("<=|")): k
                  for k, v in _STORAGE_DTYPES.items()}


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------

class _StorageType:
    """Stand-in for the pickled ``torch.FloatStorage`` etc. class objects."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]


def _rebuild_tensor_v2(storage: np.ndarray, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    """numpy reimplementation of torch._utils._rebuild_tensor_v2."""
    if not size:
        return storage[storage_offset].copy()
    itemsize = storage.dtype.itemsize
    byte_strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:], shape=tuple(size), strides=byte_strides,
        writeable=False,
    )
    return np.ascontiguousarray(view)


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: torch globals become numpy reconstruction."""

    def __init__(self, data: bytes, zf: zipfile.ZipFile, root: str):
        super().__init__(io.BytesIO(data))
        self._zf = zf
        self._root = root

    _SAFE = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_parameter"):
            staticmethod(lambda data, requires_grad=False, hooks=None: data),
    }

    def find_class(self, module: str, name: str):
        if (module, name) in self._SAFE:
            obj = self._SAFE[(module, name)]
            return obj.__func__ if isinstance(obj, staticmethod) else obj
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "builtins":
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint references unsupported global {module}.{name}"
        )

    def persistent_load(self, pid):
        typename, storage_type, key, _location, _numel = pid
        if typename != "storage":  # pragma: no cover
            raise pickle.UnpicklingError(f"unknown persistent id {typename}")
        raw = self._zf.read(f"{self._root}/data/{key}")
        return np.frombuffer(raw, dtype=storage_type.dtype)


def read_torch_checkpoint(path: str) -> Any:
    """Load a torch.save zipfile archive into numpy-backed containers.

    Tensors come back as contiguous ``np.ndarray``; everything else keeps
    its pickled python type.  No torch required.
    """
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: not a torch zipfile checkpoint "
                             "(no data.pkl member)")
        root = pkl_names[0][: -len("/data.pkl")]
        byteorder = "little"
        if f"{root}/byteorder" in zf.namelist():
            byteorder = zf.read(f"{root}/byteorder").decode().strip()
        if byteorder != "little":  # pragma: no cover
            raise ValueError(f"{path}: unsupported byte order {byteorder!r}")
        data = zf.read(pkl_names[0])
        return _TorchUnpickler(data, zf, root).load()


# --------------------------------------------------------------------------
# writer — hand-assembled protocol-2 pickle (no import of torch classes, so
# it works in torch-free environments; torch.load accepts the output)
# --------------------------------------------------------------------------

class _PickleWriter:
    def __init__(self):
        self.out = bytearray(b"\x80\x02")  # PROTO 2
        self._memo: Dict[Any, int] = {}

    def _put(self):
        n = len(self._memo)
        self._memo[n] = n
        if n < 256:
            self.out += b"q" + struct.pack("<B", n)       # BINPUT
        else:
            self.out += b"r" + struct.pack("<I", n)       # LONG_BINPUT
        return n

    def unicode(self, s: str):
        raw = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(raw)) + raw
        self._put()

    def int(self, v: int):
        if 0 <= v < 256:
            self.out += b"K" + struct.pack("<B", v)       # BININT1
        elif 0 <= v < 65536:
            self.out += b"M" + struct.pack("<H", v)       # BININT2
        elif -(2 ** 31) <= v < 2 ** 31:
            self.out += b"J" + struct.pack("<i", v)       # BININT
        else:
            raw = v.to_bytes((v.bit_length() + 8) // 8, "little", signed=True)
            self.out += b"\x8a" + struct.pack("<B", len(raw)) + raw  # LONG1

    def bool(self, v: bool):
        self.out += b"\x88" if v else b"\x89"             # NEWTRUE/NEWFALSE

    def global_(self, module: str, name: str) -> int:
        self.out += b"c" + f"{module}\n{name}\n".encode("ascii")
        return self._put()

    def get(self, memo_id: int):
        if memo_id < 256:
            self.out += b"h" + struct.pack("<B", memo_id)  # BINGET
        else:
            self.out += b"j" + struct.pack("<I", memo_id)  # LONG_BINGET

    def mark(self):
        self.out += b"("

    def tuple_(self):
        self.out += b"t"
        self._put()

    def small_tuple(self, n: int):
        self.out += {0: b")", 1: b"\x85", 2: b"\x86", 3: b"\x87"}[n]
        if n:
            self._put()

    def empty_dict(self):
        self.out += b"}"
        self._put()

    def setitems(self):
        self.out += b"u"

    def reduce(self):
        self.out += b"R"
        self._put()

    def persid(self):
        self.out += b"Q"

    def stop(self) -> bytes:
        self.out += b"."
        return bytes(self.out)


def _state_dict_pickle(state_dict: "OrderedDict[str, np.ndarray]") -> bytes:
    """data.pkl bytes for a flat state dict (same structure torch.save
    emits for one: dict of _rebuild_tensor_v2 reductions)."""
    w = _PickleWriter()
    w.empty_dict()
    w.mark()
    rebuild_memo = storage_memo = cpu_memo = odict_memo = None
    storage_global_memo: Dict[str, int] = {}
    for key_idx, (name, arr) in enumerate(state_dict.items()):
        arr = np.ascontiguousarray(arr)
        storage_name = _DTYPE_STORAGE[np.dtype(arr.dtype.str.lstrip("<=|"))]
        w.unicode(name)
        if rebuild_memo is None:
            rebuild_memo = w.global_("torch._utils", "_rebuild_tensor_v2")
        else:
            w.get(rebuild_memo)
        w.mark()                                   # args tuple
        w.mark()                                   # persistent id tuple
        if storage_memo is None:
            w.unicode("storage")
            storage_memo = len(w._memo) - 1
        else:
            w.get(storage_memo)
        if storage_name not in storage_global_memo:
            storage_global_memo[storage_name] = w.global_("torch", storage_name)
        else:
            w.get(storage_global_memo[storage_name])
        w.unicode(str(key_idx))
        if cpu_memo is None:
            w.unicode("cpu")
            cpu_memo = len(w._memo) - 1
        else:
            w.get(cpu_memo)
        w.int(arr.size)
        w.tuple_()
        w.persid()
        w.int(0)                                   # storage offset
        shape = arr.shape
        strides = tuple(int(s // arr.itemsize) for s in arr.strides)
        for seq in (shape, strides):
            if len(seq) <= 3:
                for v in seq:
                    w.int(v)
                w.small_tuple(len(seq))
            else:
                w.mark()
                for v in seq:
                    w.int(v)
                w.tuple_()
        w.bool(False)                              # requires_grad
        if odict_memo is None:
            odict_memo = w.global_("collections", "OrderedDict")
        else:
            w.get(odict_memo)
        w.small_tuple(0)
        w.reduce()                                 # backward hooks
        w.tuple_()                                 # close args tuple
        w.reduce()                                 # _rebuild_tensor_v2(...)
    w.setitems()
    return w.stop()


def write_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                           root: str = "archive") -> None:
    """Write a flat state dict as a torch.save-compatible zipfile archive.

    Pure python/numpy — the inverse of ``read_torch_checkpoint``, and
    accepted by ``torch.load`` (pinned in tests/model/test_torch_io.py).
    """
    items = OrderedDict(
        (k, np.ascontiguousarray(v)) for k, v in state_dict.items()
    )
    for k, v in items.items():
        dt = np.dtype(v.dtype.str.lstrip("<=|"))
        if dt not in _DTYPE_STORAGE:
            raise ValueError(f"{k}: unsupported dtype {v.dtype}")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", _state_dict_pickle(items))
        for idx, arr in enumerate(items.values()):
            le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
            zf.writestr(f"{root}/data/{idx}", le.tobytes())
        zf.writestr(f"{root}/byteorder", "little")
        zf.writestr(f"{root}/version", "3\n")
