#!/usr/bin/env python
"""View raw ModelNet40 point clouds.

Mirrors the reference script
(reference scripts/visualization/show_modelnet40.py): iterate the model
list, show every 10th cloud in the 3D viewer.  ``--save-dir`` renders to
files instead of a window for headless use.
"""
import argparse
import os.path as osp
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.data.readers import ModelNet40PointClouds  # noqa: E402
from deepclr_tpu.utils.pcv import PointCloudVisualizer  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Test ModelNet40.")
    parser.add_argument("filename", type=str,
                        help="TXT file with list of all model files.")
    parser.add_argument("--shapes", default=None, type=str, nargs="*")
    parser.add_argument("--save-dir", type=str, default=None,
                        help="write renderings to files (headless)")
    args = parser.parse_args()

    df = ModelNet40PointClouds(args.filename, args.shapes)

    visualizer = PointCloudVisualizer()
    visualizer.set_window_size(640, 480)
    visualizer.set_background(0.5, 0.5, 0.5)
    visualizer.set_ground_plane(True)

    for i, data in enumerate(df):
        cloud = data["cloud"]
        if i % 10 == 0:
            print(f"Iteration {i + 1}/{len(df)}")
            visualizer.update_point_cloud(
                "cloud", cloud[:, :3], color=[1, 0, 0], size=2
            )
            if args.save_dir:
                visualizer.save(osp.join(args.save_dir, f"model_{i:06d}.png"))
            else:
                visualizer.spin_once(1000)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("Interrupted by user")
