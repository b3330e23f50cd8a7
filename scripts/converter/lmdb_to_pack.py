#!/usr/bin/env python3
"""Migrate reference-era LMDB datasets to .pack stores.

Datasets converted with the reference tooling (tensorpack LMDBSerializer,
reference scripts/converter/*.py) can be reused without re-running the raw
converters:

    python scripts/converter/lmdb_to_pack.py INPUT.lmdb [OUTPUT.pack]

Uses the dependency-free LMDB parser (deepclr_tpu/data/lmdb_reader.py);
sample dicts carry over unchanged, so sequence/pair .pack datasets built
from migrated files behave like natively converted ones.
"""
import argparse
import os.path as osp
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.data.lmdb_reader import iter_reference_lmdb  # noqa: E402
from deepclr_tpu.data.pack import PackWriter  # noqa: E402


def convert(input_file: str, output_file: str) -> int:
    n = 0
    with PackWriter(output_file) as w:
        for key, sample in iter_reference_lmdb(input_file):
            w.put(key, sample)
            n += 1
    return n


def main():
    parser = argparse.ArgumentParser(
        description="Convert a reference LMDB dataset into a .pack store."
    )
    parser.add_argument("input", type=str, help="LMDB file (single-file env)")
    parser.add_argument("output", type=str, nargs="?", default=None,
                        help="output .pack (default: input with .pack suffix)")
    args = parser.parse_args()

    output = args.output or osp.splitext(args.input)[0] + ".pack"
    n = convert(args.input, output)
    print(f"converted {n} samples -> {output}")


if __name__ == "__main__":
    main()
