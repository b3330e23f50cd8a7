#!/usr/bin/env python
"""Generate a synthetic ModelNet40-layout dataset tree.

No real datasets ship in this environment, so this produces CAD-like
surface clouds (deepclr_tpu/data/synthetic.py cad_cloud: unions of
box/cylinder/sphere/torus primitives with exact normals, unit-sphere
normalized — the same statistics class as PointNet++-preprocessed
ModelNet40) in the exact raw layout the converters expect:

  OUT/original/{shape}/{shape}_{i:04d}.txt   csv, 6 cols xyz+normals
  OUT/original/modelnet40_train.txt / modelnet40_test.txt

After this, the stock pipeline runs unchanged:
  MODELNET40_PATH=OUT python scripts/converter/modelnet40.py
  MODELNET40_PATH=OUT python scripts/converter/modelnet40_test.py
  python scripts/training.py CONFIG.yaml ...

Usage: python scripts/make_synthetic_modelnet.py OUT
       [--train-per-shape 8] [--test-per-shape 2] [--points 8192]
"""
import argparse
import os
import os.path as osp
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.data.synthetic import cad_cloud  # noqa: E402
from scripts.converter.modelnet40 import SHAPES_SEEN, SHAPES_UNSEEN  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", type=str)
    ap.add_argument("--train-per-shape", type=int, default=8)
    ap.add_argument("--test-per-shape", type=int, default=2)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    original = osp.join(args.out, "original")
    rng = np.random.default_rng(args.seed)
    train_names, test_names = [], []
    for shape in [*SHAPES_SEEN, *SHAPES_UNSEEN]:
        os.makedirs(osp.join(original, shape), exist_ok=True)
        total = args.train_per_shape + args.test_per_shape
        for i in range(total):
            name = f"{shape}_{i + 1:04d}"
            cloud = cad_cloud(rng, args.points)
            np.savetxt(osp.join(original, shape, f"{name}.txt"), cloud,
                       delimiter=",", fmt="%.6f")
            (train_names if i < args.train_per_shape else test_names).append(name)
        print(f"{shape}: {total} models")

    for listing, names in (("modelnet40_train.txt", train_names),
                           ("modelnet40_test.txt", test_names)):
        with open(osp.join(original, listing), "w") as f:
            f.write("\n".join(names) + "\n")
    print(f"wrote {len(train_names)} train / {len(test_names)} test models")


if __name__ == "__main__":
    main()
