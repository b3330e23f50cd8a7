#!/usr/bin/env python
"""Generate a synthetic KITTI-odometry-layout raw dataset.

Drives a virtual HDL-64 sensor along a smooth 2-D trajectory through one
persistent procedural scene (deepclr_tpu/data/synthetic.py) and writes the
exact raw layout the KITTI tooling expects:

  OUT/original/sequences/{seq}/velodyne/{i:06d}.bin   float32 x,y,z,refl
  OUT/original/sequences/{seq}/times.txt, calib.txt   (Tr = identity)
  OUT/original/poses/{seq}.txt                        12-col rows

With Tr = identity the cam0 frame equals the velodyne frame, so the
cam->velo pose conversion in the readers and export_kitti_poses is an
exercised no-op round trip.  After this the stock pipeline runs unchanged:

  KITTI_PATH=OUT python scripts/converter/kitti_odometry.py
  python scripts/training.py CONFIG.yaml ...

Usage: python scripts/make_synthetic_kitti.py OUT
       [--sequences 00,01,04] [--frames 160] [--points 32768]
"""
import argparse
import os
import os.path as osp
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.data.synthetic import lidar_scan, make_scene  # noqa: E402


def trajectory(rng, frames, speed=1.2):
    """Smooth driven path: per-frame poses (4, 4), ~`speed` m per frame."""
    poses = [np.eye(4)]
    yaw = 0.0
    yaw_rate = 0.0
    for _ in range(frames - 1):
        yaw_rate = 0.9 * yaw_rate + 0.1 * rng.normal(0, 0.02)
        yaw += yaw_rate
        prev = poses[-1]
        step = np.eye(4)
        c, s = np.cos(yaw), np.sin(yaw)
        step[:2, :2] = [[c, -s], [s, c]]
        step[0, 3] = prev[0, 3] + speed * c
        step[1, 3] = prev[1, 3] + speed * s
        step[2, 3] = 0.02 * np.sin(0.05 * len(poses))  # gentle undulation
        poses.append(step)
    return poses


def write_sequence(out, seq, frames, points, seed, speed=1.2):
    rng = np.random.default_rng(seed)
    seq_dir = osp.join(out, "original", "sequences", seq)
    os.makedirs(osp.join(seq_dir, "velodyne"), exist_ok=True)
    os.makedirs(osp.join(out, "original", "poses"), exist_ok=True)

    # one big persistent scene covering the whole drive (scene obstacles
    # are placed around the trajectory envelope)
    poses = trajectory(rng, frames, speed=speed)
    span = np.array([p[:3, 3] for p in poses])
    lo = span.min(0) - 50
    hi = span.max(0) + 50
    n_obs = max(60, int((hi[0] - lo[0]) * (hi[1] - lo[1]) / 400))
    obs_lo, obs_hi = make_scene(rng, n_obstacles=n_obs)
    # re-spread the obstacles over the drive envelope
    shift = rng.uniform(lo[:2], hi[:2], (n_obs, 2)) - (obs_lo[:, :2] + obs_hi[:, :2]) / 2
    obs_lo[:, :2] += shift
    obs_hi[:, :2] += shift
    scene = (obs_lo, obs_hi)

    rows = []
    for i, pose in enumerate(poses):
        cloud = lidar_scan(rng, points, scene=scene, sensor_pose=pose)
        cloud.astype(np.float32).tofile(
            osp.join(seq_dir, "velodyne", f"{i:06d}.bin"))
        rows.append(pose[:3, :].reshape(-1))
        if (i + 1) % 50 == 0:
            print(f"  {seq}: frame {i + 1}/{frames}", flush=True)

    np.savetxt(osp.join(out, "original", "poses", f"{seq}.txt"),
               np.stack(rows), fmt="%.9f")
    np.savetxt(osp.join(seq_dir, "times.txt"),
               np.arange(frames) * 0.1, fmt="%.6f")
    with open(osp.join(seq_dir, "calib.txt"), "w") as f:
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", type=str)
    ap.add_argument("--sequences", type=str, default="00,01,04")
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speed", type=float, default=1.2,
                    help="trajectory speed, m per frame (denser DeepVCP\n                    pairs at lower speeds)")
    args = ap.parse_args()

    for k, seq in enumerate(args.sequences.split(",")):
        print(f"sequence {seq} ({args.frames} frames)")
        write_sequence(args.out, seq, args.frames, args.points,
                       args.seed + 1000 * k, speed=args.speed)
    print("done")


if __name__ == "__main__":
    main()
