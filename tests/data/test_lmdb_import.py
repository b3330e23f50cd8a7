"""LMDB import path: the dependency-free parser + lmdb_to_pack converter.

No lmdb package ships in this image, so the fixture below writes a minimal
but format-correct single-file LMDB environment by hand (one leaf page,
overflow pages for large values, both meta pages) with tensorpack-
LMDBSerializer conventions: keys b"%08d" + b"__keys__", values
msgpack-numpy blobs.  Layout constants mirror liblmdb 0.9 / mdb.c.
"""
import struct
import subprocess
import sys
from pathlib import Path

import msgpack
import numpy as np
import pytest

from deepclr_tpu.data.lmdb_reader import (
    LMDBFile,
    iter_reference_lmdb,
    load_keys,
)
from deepclr_tpu.data.pack import PackReader

REPO = Path(__file__).resolve().parents[2]
PSIZE = 4096


def _msgpack_numpy(obj):
    """tensorpack `dumps`: msgpack with msgpack-numpy encoding."""
    def enc(o):
        if isinstance(o, np.ndarray):
            return {b"nd": True, b"type": o.dtype.str,
                    b"shape": o.shape, b"data": o.tobytes()}
        if isinstance(o, (np.bool_, np.number)):
            return {b"nd": False, b"type": o.dtype.str, b"data": o.tobytes()}
        return o

    return msgpack.packb(obj, use_bin_type=True, default=enc)


def _write_lmdb(path, entries):
    """Minimal single-file LMDB env: metas at pgno 0/1, one leaf at pgno 2,
    overflow pages for any value that does not fit inline."""
    entries = sorted(entries)
    next_pg = 3
    nodes = []  # (key, inline_value | None, (ov_pgno, size) | None)
    overflow_blobs = []
    for key, value in entries:
        node_size = 8 + len(key) + len(value)
        if node_size <= 1024:  # comfortably inline
            nodes.append((key, value, None))
        else:
            npages = -(-(_HDR_PAD + len(value)) // PSIZE)
            overflow_blobs.append((next_pg, npages, value))
            nodes.append((key, None, (next_pg, len(value))))
            next_pg += npages

    # leaf page
    leaf = bytearray(PSIZE)
    n = len(nodes)
    struct.pack_into("<Q", leaf, 0, 2)             # pgno
    struct.pack_into("<HHH", leaf, 10, 0x02,        # P_LEAF
                     16 + 2 * n, PSIZE)             # lower, upper (fixed up)
    # pack nodes from the end of the page downward (mdb layout)
    offsets = []
    cursor = PSIZE
    for key, inline, ov in nodes:
        data = inline if inline is not None else struct.pack("<Q", ov[0])
        size = len(inline) if inline is not None else ov[1]
        node = struct.pack("<HHHH", size & 0xFFFF, size >> 16,
                           0x00 if inline is not None else 0x01,  # F_BIGDATA
                           len(key)) + key + data
        if len(node) % 2:
            node += b"\x00"
        cursor -= len(node)
        leaf[cursor:cursor + len(node)] = node
        offsets.append(cursor)
    struct.pack_into("<HHH", leaf, 10, 0x02, 16 + 2 * n, cursor)
    struct.pack_into(f"<{n}H", leaf, 16, *offsets)

    def meta(txnid, pgno):
        m = bytearray(PSIZE)
        struct.pack_into("<Q", m, 0, pgno)
        struct.pack_into("<H", m, 10, 0x08)         # P_META
        struct.pack_into("<II", m, 16, 0xBEEFC0DE, 1)
        struct.pack_into("<I", m, 40, PSIZE)        # FREE_DBI md_pad = psize
        struct.pack_into("<Q", m, 48 + 32, 0xFFFFFFFFFFFFFFFF)  # free root
        struct.pack_into("<Q", m, 120, len(nodes))  # main entries
        struct.pack_into("<Q", m, 128, 2)           # main root = leaf pgno
        struct.pack_into("<H", m, 94, 1)            # main depth
        struct.pack_into("<Q", m, 136, next_pg - 1)  # last_pg
        struct.pack_into("<Q", m, 144, txnid)
        return m

    with open(path, "wb") as f:
        f.write(meta(0, 0))
        f.write(meta(1, 1))
        f.write(leaf)
        for pgno, npages, value in overflow_blobs:
            buf = bytearray(npages * PSIZE)
            struct.pack_into("<Q", buf, 0, pgno)
            struct.pack_into("<H", buf, 10, 0x04)   # P_OVERFLOW
            struct.pack_into("<I", buf, 12, npages)
            buf[16:16 + len(value)] = value
            f.write(buf)


_HDR_PAD = 16


@pytest.fixture
def lmdb_file(tmp_path):
    rng = np.random.default_rng(0)
    samples = {}
    entries = []
    keys = []
    for i in range(3):
        key = f"{i:08d}".encode()
        sample = {
            b"idx": i,
            b"timestamp": float(i) * 1e5,
            b"pose": np.eye(4, dtype=np.float64),
            b"cloud": rng.normal(size=(700, 4)).astype(np.float32),
        }
        samples[key.decode()] = sample
        entries.append((key, _msgpack_numpy(sample)))
        keys.append(key)
    entries.append((b"__keys__", _msgpack_numpy(keys)))
    path = tmp_path / "00.lmdb"
    _write_lmdb(path, entries)
    return path, samples


def test_lmdb_parser_roundtrip(lmdb_file):
    path, samples = lmdb_file
    raw = dict(LMDBFile(str(path)).items())
    assert b"__keys__" in raw
    assert len(raw) == 4

    out = dict(iter_reference_lmdb(str(path)))
    assert sorted(out) == sorted(samples)
    for key, sample in samples.items():
        got = out[key]
        assert got["idx"] == sample[b"idx"]
        np.testing.assert_array_equal(got["pose"], sample[b"pose"])
        np.testing.assert_array_equal(got["cloud"], sample[b"cloud"])

    assert load_keys(str(path)) == sorted(samples)


def test_lmdb_to_pack_cli(lmdb_file, tmp_path):
    path, samples = lmdb_file
    out = tmp_path / "00.pack"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/converter/lmdb_to_pack.py"),
         str(path), str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "converted 3 samples" in r.stdout

    with PackReader(str(out)) as reader:
        assert sorted(reader.keys) == sorted(samples)
        for key, sample in samples.items():
            got = reader[key]
            np.testing.assert_array_equal(got["cloud"], sample[b"cloud"])
            np.testing.assert_array_equal(got["pose"], sample[b"pose"])
