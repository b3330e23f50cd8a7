#!/usr/bin/env python3
"""Convert raw KITTI odometry sequences into per-frame .pack stores
(reference scripts/converter/kitti_odometry.py: every 2nd velodyne point)."""
import os
import os.path as osp

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.data.pack import PackWriter
from deepclr_tpu.data.readers import KittiOdometryVelodyneData
from deepclr_tpu.data.transforms import SystematicErasing

SEQUENCES = [f"{i:02d}" for i in range(22)]
NTH = 2


def convert_sequence(base_path: str, sequence: str, output_file: str) -> None:
    df = KittiOdometryVelodyneData(base_path, sequence, shuffle=False)
    erase = SystematicErasing(NTH)
    with PackWriter(output_file) as w:
        for i, sample in enumerate(df):
            sample = erase(sample)
            w.put(f"{i:08d}", sample)


def main():
    kitti_path = os.getenv("KITTI_PATH")
    if kitti_path is None:
        raise RuntimeError("Environment variable KITTI_PATH not defined.")
    kitti_base_path = osp.join(kitti_path, "original")
    kitti_odometry_path = osp.join(kitti_path, "odometry")
    os.makedirs(kitti_odometry_path, exist_ok=True)

    for seq in SEQUENCES:
        if not osp.isdir(osp.join(kitti_base_path, "sequences", seq, "velodyne")):
            print(f"Skip sequence {seq} (no velodyne data)")
            continue
        print(f"Convert sequence {seq}")
        convert_sequence(
            kitti_base_path, seq, osp.join(kitti_odometry_path, f"{seq}.pack")
        )


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("Interrupted by user")
