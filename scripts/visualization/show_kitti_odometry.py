#!/usr/bin/env python
"""View raw KITTI odometry velodyne data: animated clouds + driven path.

Mirrors the reference script
(reference scripts/visualization/show_kitti_odometry.py): iterate a raw
(non-converted) sequence, show every 100th cloud in the 3D viewer, then
plot the accumulated path.  ``--save-dir`` renders to files instead of a
window for headless use.
"""
import argparse
import os.path as osp
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.data.readers import KittiOdometryVelodyneData  # noqa: E402
from deepclr_tpu.utils.pcv import PointCloudVisualizer  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Test KITTI Velodyne Odometry.")
    parser.add_argument("base_path", type=str)
    parser.add_argument("sequence", type=str)
    parser.add_argument("--save-dir", type=str, default=None,
                        help="write renderings to files (headless)")
    args = parser.parse_args()

    df = KittiOdometryVelodyneData(args.base_path, args.sequence)

    visualizer = PointCloudVisualizer()
    visualizer.set_window_size(640, 480)
    visualizer.set_background(0.5, 0.5, 0.5)
    visualizer.set_ground_plane(True)

    path_list = []
    for i, data in enumerate(df):
        pose = data["pose"]
        cloud = data["cloud"]
        path_list.append(pose[:3, 3])

        if i % 100 == 0:
            print(f"Iteration {i + 1}/{len(df)}")
            visualizer.update_point_cloud(
                "cloud", cloud[:, :3], color=[1, 0, 0], size=2
            )
            if args.save_dir:
                visualizer.save(osp.join(args.save_dir, f"cloud_{i:06d}.png"))
            else:
                visualizer.spin_once(1000)

    path = np.array(path_list)

    import matplotlib.pyplot as plt

    plt.figure()
    plt.plot(path[:, 0], path[:, 1], "-")
    plt.xlabel("x [m]")
    plt.ylabel("y [m]")
    plt.axis("equal")
    plt.title(f"Sequence {args.sequence} path")
    if args.save_dir:
        plt.savefig(osp.join(args.save_dir, "path.png"))
    else:
        plt.show()


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("Interrupted by user")
