#!/usr/bin/env python3
"""Multi-seed accuracy-variance study: raw final weights vs Polyak EMA.

Motivation: two identical 50k KITTI-protocol runs produced devkit TOTAL
t_err 2.97% vs 4.54% (docs/kitti_synth.md) — long-horizon drift is
dominated by accumulated yaw error and is sensitive to exactly where
training stops.  ``optimizer.weight_ema_decay`` maintains a Polyak
average of the params as a stabilizer; this driver quantifies, over N
seeds of the 12k protocol, whether evaluating the EMA weights shrinks
the run-to-run spread relative to the raw final weights.

Design: the weight EMA is passive (engine/trainer.py — param_ema is
written from new_params and never read back into the update), so ONE
training run per seed with EMA tracking enabled yields BOTH arms:
  * raw  — sequential inference with ``weights.msgpack``
  * ema  — sequential inference with ``weights_ema.msgpack``
This makes the comparison paired (same trajectory, same data order) and
halves the compute vs training each arm separately.

Pipeline per seed (all stock CLIs, as a user would run them; reference
workflow /root/reference/scripts/{training,inference,evaluation,
export_kitti_poses}.py + devkit):
  train (segmented supervisor) -> inference x2 (raw / ema weights)
  -> evaluation.py -> export_kitti_poses.py -> C++ devkit

Stages are idempotent; a partial JSON is written after every seed so the
study survives restarts and can be read mid-flight.

Usage:
  python scripts/seed_study.py --workdir /root/repo/.studies/seed12k \
      [--seeds 0,1,2,3] [--ema-decay 0.999] [--train-steps 12000]
"""
import argparse
import json
import math
import os
import re
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
    packs = [kitti / "odometry" / f"{s}.pack" for s in args.sequences]
    if all(p.exists() for p in packs):
        print("dataset: packs present, skipping generation", flush=True)
        return
    sh([sys.executable, REPO / "scripts" / "make_synthetic_kitti.py",
        kitti, "--sequences", ",".join(args.sequences),
        "--frames", args.frames, "--points", args.points], env, log)
    sh([sys.executable, REPO / "scripts" / "converter" / "kitti_odometry.py"],
       env, log)


def ensure_trained(seed, env, args, log):
    """Train seed `seed` (EMA tracking on) unless already finished.
    Returns the experiment dir holding ckpt_final + weights symlinks."""
    models = Path(env["MODEL_PATH"])
    models.mkdir(parents=True, exist_ok=True)
    done = sorted(models.glob("*/ckpt_final_*.msgpack"), key=os.path.getmtime)
    if done:
        exp = done[-1].parent
        print(f"seed {seed}: finished experiment present: {exp.name}",
              flush=True)
        return exp

    steps = int(args.train_steps)
    cyc_frac, flat_frac = (float(x) for x in args.schedule_split.split(","))
    cyc, flat = int(steps * cyc_frac), int(steps * flat_frac)
    cfg_path = Path(args.workdir) / f"train_seed{seed}.yaml"
    cfg = {
        "extends": str(REPO / "configs" / "training" / "kitti_synth.yaml"),
        "identifier": f"seed{seed}",
        "seed": int(seed),
        "data": {
            "training": [
                str(Path(env["KITTI_PATH"]) / "odometry" / f"{s}.pack")
                for s in args.sequences[:-1]
            ],
            "validation": str(Path(env["KITTI_PATH"]) / "odometry"
                              / f"{args.sequences[-1]}.pack"),
        },
        "optimizer": {"max_iterations": steps,
                      "weight_ema_decay": float(args.ema_decay)},
        # scheduler.params is one leaf dict param: overriding it REPLACES
        # the extends-base dict, so carry the full reference recipe here
        "scheduler": {"params": {
            "cyclic_iterations": cyc,
            "flat_iterations": flat,
            "annealing_iterations": steps - cyc - flat,
            "step_size_up": max(1, cyc // 12),
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
    assert done, f"seed {seed}: training finished but no final checkpoint"
    return done[-1].parent


def run_arm(seed, arm, weights_file, exp, env, args, log):
    """inference -> evaluation -> pose export -> devkit; returns stats."""
    out_base = Path(args.workdir) / f"runs_seed{seed}_{arm}"
    runs = [d for d in out_base.glob("*") if (d / "scenario.yaml").exists()]
    if not runs:
        sh([sys.executable, REPO / "scripts" / "inference.py",
            REPO / "configs" / "scenarios" / "kitti_synth.yaml",
            exp.name, out_base, "--weights", weights_file], env, log)
        runs = [d for d in out_base.glob("*")
                if (d / "scenario.yaml").exists()]
    run_dir = sorted(runs, key=os.path.getmtime)[-1]
    if not (run_dir / "evaluation").exists():
        sh([sys.executable, REPO / "scripts" / "evaluation.py", run_dir],
           env, log)
    if not (run_dir / "kitti").exists():
        sh([sys.executable, REPO / "scripts" / "export_kitti_poses.py",
            run_dir], env, log)
    result_dir = run_dir / "kitti" / "result"
    if not (result_dir / "stats.txt").exists():
        sh([sys.executable, "-m", "deepclr_tpu.kitti_devkit",
            Path(env["KITTI_PATH"]) / "original" / "poses",
            run_dir / "kitti", result_dir, "--no-plots"], env, log)
    out = {}
    for line in (result_dir / "stats.txt").read_text().splitlines():
        m = re.match(r"(\S+)\s+t_err\[%\]\s+([\d.eE+-]+)"
                     r"\s+r_err\[deg/m\]\s+([\d.eE+-]+)", line)
        if m:
            out[m.group(1)] = {"t_err_pct": float(m.group(2)),
                               "r_err_deg_per_m": float(m.group(3))}
    return out


def mean_std(xs):
    n = len(xs)
    mu = sum(xs) / n
    var = sum((x - mu) ** 2 for x in xs) / max(n - 1, 1)
    return {"mean": mu, "std": math.sqrt(var), "n": n,
            "min": min(xs), "max": max(xs)}


def summarize(report):
    per_arm = {}
    for arm in ("raw", "ema"):
        t = [s[arm]["TOTAL"]["t_err_pct"] for s in report["seeds"].values()
             if arm in s and "TOTAL" in s[arm]]
        r = [s[arm]["TOTAL"]["r_err_deg_per_m"]
             for s in report["seeds"].values()
             if arm in s and "TOTAL" in s[arm]]
        if t:
            per_arm[arm] = {"t_err_pct": mean_std(t),
                            "r_err_deg_per_m": mean_std(r)}
    report["summary"] = per_arm
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/repo/.studies/seed12k")
    ap.add_argument("--seeds", default="0,1,2,3")
    ap.add_argument("--sequences", default="00,01,04")
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--train-steps", type=int, default=12000)
    ap.add_argument("--ema-decay", type=float, default=0.999)
    ap.add_argument("--schedule-split", default="0.75,0.125",
                    help="cyclic,flat schedule fractions; annealing gets "
                         "the remainder (r5 stabilizer arms: longer "
                         "annealing tails)")
    ap.add_argument("--rss-limit-gb", type=float, default=40.0)
    ap.add_argument("--json", default=None,
                    help="output JSON (default WORKDIR/seed_study.json)")
    args = ap.parse_args()
    args.sequences = args.sequences.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    log = wd / "pipeline.log"
    out_json = Path(args.json) if args.json else wd / "seed_study.json"

    env = dict(os.environ)
    env.setdefault("KITTI_PATH", str(wd / "kitti"))

    ensure_dataset(env, args, log)

    report = {"train_steps": args.train_steps, "ema_decay": args.ema_decay,
              "sequences": args.sequences, "frames": args.frames,
              "seeds": {}}
    if out_json.exists():
        report = json.loads(out_json.read_text())

    for seed in seeds:
        env_s = dict(env, MODEL_PATH=str(wd / f"models_seed{seed}"))
        exp = ensure_trained(seed, env_s, args, log)
        entry = report["seeds"].setdefault(str(seed), {})
        entry["experiment"] = exp.name
        entry["raw"] = run_arm(seed, "raw", "weights.msgpack", exp,
                               env_s, args, log)
        entry["ema"] = run_arm(seed, "ema", "weights_ema.msgpack", exp,
                               env_s, args, log)
        summarize(report)
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"seed {seed} done: raw TOTAL "
              f"{entry['raw'].get('TOTAL')} | ema TOTAL "
              f"{entry['ema'].get('TOTAL')}", flush=True)

    print(json.dumps(report["summary"], indent=2))


if __name__ == "__main__":
    main()
