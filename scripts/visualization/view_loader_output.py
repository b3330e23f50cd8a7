#!/usr/bin/env python3
"""Visualize batches produced by the training data loader (reference
scripts/visualization loader viewer): shows padded/masked clouds with the
deferred augmentations applied, exactly as the model sees them."""
import argparse

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepclr_tpu.config import Mode, load_config
from deepclr_tpu.data import make_data_loader
from deepclr_tpu.utils.pcv import PointCloudVisualizer


def main():
    parser = argparse.ArgumentParser(description="View data loader batches.")
    parser.add_argument("config", type=str, help="training configuration (*.yaml)")
    parser.add_argument("--num_batches", type=int, default=1)
    parser.add_argument("--save", type=str, default=None)
    args = parser.parse_args()

    cfg = load_config(args.config, Mode.TEST)
    loader = make_data_loader(cfg, is_train=True)

    for bi, batch in enumerate(loader):
        if bi >= args.num_batches:
            break
        for i in range(batch["template"].shape[0]):
            t_mask = batch["template_mask"][i]
            s_mask = batch["source_mask"][i]
            template = batch["template"][i][t_mask][:, :3]
            source = batch["source"][i][s_mask][:, :3]
            # bake the deferred augmentations like DeepCLR.encode does
            mt, ms = batch["aug_template"][i], batch["aug_source"][i]
            template = template @ mt[:3, :3].T + mt[:3, 3]
            source = source @ ms[:3, :3].T + ms[:3, 3]

            viz = PointCloudVisualizer()
            viz.add_cloud("template", template, color=(0.2, 0.4, 1.0))
            viz.add_cloud("source", source, color=(1.0, 0.4, 0.2))
            print(f"batch {bi} sample {i}: y={np.round(batch['y'][i], 4)}")
            if args.save:
                viz.save(f"{args.save}_{bi:02d}_{i:02d}.png")
            else:
                viz.spin()
            viz.close()


if __name__ == "__main__":
    main()
