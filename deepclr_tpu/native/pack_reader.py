"""ctypes binding for the native mmap .pack reader (native/pack_reader.cpp).

Drop-in alternative to data.pack.PackReader for the host data path: record
bytes come out of the mmap with zero copies; decoding stays in
data.pack.decode_obj.
"""
from __future__ import annotations

import ctypes
from typing import Any, List

from ..data.pack import decode_obj
from . import load_library

__all__ = ["NativePackReader"]


class NativePackReader:
    """API-compatible subset of data.pack.PackReader backed by C++."""

    def __init__(self, path: str):
        self._lib = load_library("pack_reader")
        self._lib.pack_open.restype = ctypes.c_void_p
        self._lib.pack_open.argtypes = [ctypes.c_char_p]
        self._lib.pack_count.restype = ctypes.c_long
        self._lib.pack_count.argtypes = [ctypes.c_void_p]
        self._lib.pack_key.restype = ctypes.c_long
        self._lib.pack_key.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ]
        self._lib.pack_get.restype = ctypes.c_long
        self._lib.pack_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ]
        self._lib.pack_close.argtypes = [ctypes.c_void_p]

        self._handle = self._lib.pack_open(path.encode())
        if not self._handle:
            raise ValueError(f"Not a pack file: {path}")

        n = self._lib.pack_count(self._handle)
        buf = ctypes.create_string_buffer(512)
        self._keys: List[str] = []
        for i in range(n):
            self._lib.pack_key(self._handle, i, buf, len(buf))
            self._keys.append(buf.value.decode())

    @property
    def keys(self) -> List[str]:
        return self._keys

    def __len__(self) -> int:
        return len(self._keys)

    def __contains__(self, key: str) -> bool:
        return key in set(self._keys)

    def __getitem__(self, key: str) -> Any:
        ptr = ctypes.POINTER(ctypes.c_ubyte)()
        length = self._lib.pack_get(self._handle, key.encode(),
                                    ctypes.byref(ptr))
        if length < 0:
            raise KeyError(key)
        data = bytes(ctypes.cast(
            ptr, ctypes.POINTER(ctypes.c_ubyte * length)
        ).contents)
        obj, _ = decode_obj(data)
        return obj

    def items(self):
        for k in self._keys:
            yield k, self[k]

    def close(self) -> None:
        if self._handle:
            self._lib.pack_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
