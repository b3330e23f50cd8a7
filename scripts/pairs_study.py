#!/usr/bin/env python3
"""End-to-end DeepVCP pairs-protocol study on synthetic drives.

The odometry (docs/kitti_synth.md) and ModelNet40 (docs/modelnet40_synth.md)
protocols have trained end-to-end studies; this driver closes the third
reference protocol: KITTI artificial pairs a la DeepVCP (reference
scripts/converter/kitti_pairs.py:21 — anchor every 30 frames, pairs within
5 m, GT baked into the source; test set perturbed uniformly +/-1 m, +/-1 deg
per kitti_pairs_test.py:15-17; results table per
scripts/paper/kitti_artificial_table.py:31-46).

Pipeline (stock CLIs only):
  1. synthesize 11 HDL-64-style drives (00..10) + raw->pairs conversion
     (kitti_pairs.py) + perturbed test set (kitti_pairs_test.py)
  2. train configs/training/kitti_pairs.yaml with the schedule compressed
     to --train-steps (segmented supervisor)
  3. batched pairwise inference over the kitti_pairs scenario
     (inference.py --parallel_sequences: predict_batch path)
  4. evaluation.py + scripts/paper/kitti_artificial_table.py

Stages are idempotent (restart-safe).  Usage:
  python scripts/pairs_study.py --workdir /root/repo/.studies/pairs12k
"""
import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]


def sh(cmd, env, log):
    print(f"+ {' '.join(map(str, cmd))}", flush=True)
    with open(log, "ab") as f:
        f.write((" ".join(map(str, cmd)) + "\n").encode())
        proc = subprocess.run([str(c) for c in cmd], env=env, cwd=str(REPO),
                              stdout=f, stderr=subprocess.STDOUT)
    if proc.returncode != 0:
        raise RuntimeError(
            f"command failed rc={proc.returncode} (log: {log}): {cmd}")


def ensure_dataset(env, args, log):
    kitti = Path(env["KITTI_PATH"])
    seqs = [f"{i:02d}" for i in range(11)]
    if not all((kitti / "original" / "sequences" / s / "velodyne").exists()
               for s in seqs):
        sh([sys.executable, REPO / "scripts" / "make_synthetic_kitti.py",
            kitti, "--sequences", ",".join(seqs),
            "--frames", args.frames, "--points", args.points,
            "--speed", args.speed], env, log)
    if not all((kitti / "pairs" / f"{s}.pack").exists() for s in seqs):
        sh([sys.executable,
            REPO / "scripts" / "converter" / "kitti_pairs.py"], env, log)
    if not all((kitti / "pairs_test" / f"{s}.pack").exists() for s in seqs):
        sh([sys.executable,
            REPO / "scripts" / "converter" / "kitti_pairs_test.py"], env, log)


def ensure_trained(env, args, log):
    models = Path(env["MODEL_PATH"])
    models.mkdir(parents=True, exist_ok=True)
    done = sorted(models.glob("*/ckpt_final_*.msgpack"), key=os.path.getmtime)
    if done:
        exp = done[-1].parent
        print(f"training: finished experiment present: {exp.name}",
              flush=True)
        return exp

    steps = int(args.train_steps)
    cfg_path = Path(args.workdir) / "train_pairs.yaml"
    cfg = {
        "extends": str(REPO / "configs" / "training" / "kitti_pairs.yaml"),
        "identifier": "pairs_study",
        "optimizer": {"max_iterations": steps,
                      "weight_ema_decay": float(args.ema_decay)},
        "scheduler": {"params": {
            "cyclic_iterations": int(steps * 0.75),
            "flat_iterations": int(steps * 0.125),
            "annealing_iterations": steps - int(steps * 0.75)
                                    - int(steps * 0.125),
            "step_size_up": max(1, int(steps * 0.75) // 12),
            "base_lr": 1e-7,
            "max_lr": 5e-4,
            "mode": "triangular",
            "cycle_momentum": False,
        }},
        "logging": {"checkpoint_period": max(500, steps // 4),
                    "validation_period": max(500, steps // 4)},
    }
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    sh([sys.executable, REPO / "scripts" / "train_supervised.py", cfg_path,
        "--rss-limit-gb", args.rss_limit_gb], env, log)
    done = sorted(models.glob("*/ckpt_final_*.msgpack"), key=os.path.getmtime)
    assert done, "training finished but no final checkpoint"
    return done[-1].parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/repo/.studies/pairs12k")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--speed", type=float, default=1.2,
                    help="m per frame; lower -> more DeepVCP pairs per "
                         "anchor (pairs span 5 m / speed frames)")
    ap.add_argument("--train-steps", type=int, default=12000)
    ap.add_argument("--ema-decay", type=float, default=0.0)
    ap.add_argument("--batch-lanes", type=int, default=8,
                    help="--parallel_sequences for pairwise inference")
    ap.add_argument("--rss-limit-gb", type=float, default=40.0)
    args = ap.parse_args()

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    log = wd / "pipeline.log"

    env = dict(os.environ)
    env.setdefault("KITTI_PATH", str(wd / "kitti"))
    env.setdefault("MODEL_PATH", str(wd / "models"))

    ensure_dataset(env, args, log)
    exp = ensure_trained(env, args, log)

    out_base = wd / "runs"
    runs = [d for d in out_base.glob("*") if (d / "scenario.yaml").exists()]
    if not runs:
        sh([sys.executable, REPO / "scripts" / "inference.py",
            REPO / "configs" / "scenarios" / "kitti_pairs.yaml",
            exp.name, out_base,
            "--parallel_sequences", args.batch_lanes], env, log)
        runs = [d for d in out_base.glob("*")
                if (d / "scenario.yaml").exists()]
    run_dir = sorted(runs, key=os.path.getmtime)[-1]
    if not (run_dir / "evaluation").exists():
        sh([sys.executable, REPO / "scripts" / "evaluation.py", run_dir],
           env, log)

    table = wd / "artificial_table.txt"
    with open(table, "w") as f:
        proc = subprocess.run(
            [sys.executable,
             str(REPO / "scripts" / "paper" / "kitti_artificial_table.py"),
             str(out_base)],
            env=env, cwd=str(REPO), stdout=f, stderr=subprocess.STDOUT)
    print(table.read_text())
    assert proc.returncode == 0

    report = {
        "train_steps": args.train_steps,
        "experiment": exp.name,
        "run_dir": str(run_dir),
        "table": table.read_text(),
    }
    with open(wd / "pairs_study.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
