#!/usr/bin/env python3
"""Visualize samples from a converted .pack dataset (reference
scripts/visualization dataflow viewers)."""
import argparse

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.data import DatasetType, create_input_dataflow
from deepclr_tpu.utils.pcv import PointCloudVisualizer


def main():
    parser = argparse.ArgumentParser(description="View dataflow samples.")
    parser.add_argument("data_file", type=str, help="pack data file")
    parser.add_argument("--dataset_type", type=str, default="generic",
                        choices=[t.value for t in DatasetType])
    parser.add_argument("--num_samples", type=int, default=3)
    parser.add_argument("--save", type=str, default=None,
                        help="save images to this prefix instead of showing")
    args = parser.parse_args()

    df = create_input_dataflow(
        DatasetType.create(args.dataset_type), args.data_file, shuffle=False
    )

    for i, sample in enumerate(df):
        if i >= args.num_samples:
            break
        viz = PointCloudVisualizer()
        viz.add_cloud("template", sample["clouds"][0], color=(0.2, 0.4, 1.0))
        viz.add_cloud("source", sample["clouds"][1], color=(1.0, 0.4, 0.2))
        print(f"sample {i}: transform=\n{sample['transform']}")
        if args.save:
            viz.save(f"{args.save}_{i:03d}.png")
        else:
            viz.spin()
        viz.close()


if __name__ == "__main__":
    main()
