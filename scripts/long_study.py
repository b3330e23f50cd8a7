#!/usr/bin/env python3
"""Flagship 50k-iteration KITTI-protocol run (docs/kitti_synth.md §long run)
with Polyak weight-EMA tracking, evaluating BOTH weight arms.

One command reproduces the long-recipe study end to end: seven 200-frame
synthetic drives (00/01/02/05/06 train, 04 validation, 10 unseen test),
stock conversion, segmented 50k training (kitti_synth_long.yaml), then for
each weights artifact (raw final + EMA): sequential inference over the
kitti_synth_test scenario, evaluation.py, pose export, C++ devkit.

Restart-safe like seed_study.py: every stage skips existing artifacts, so
an interrupted run resumes with the same command.
"""
import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]
DRIVES = ["00", "01", "02", "04", "05", "06", "10"]


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
    packs = [kitti / "odometry" / f"{s}.pack" for s in DRIVES]
    if all(p.exists() for p in packs):
        print("dataset: packs present, skipping generation", flush=True)
        return
    sh([sys.executable, REPO / "scripts" / "make_synthetic_kitti.py",
        kitti, "--sequences", ",".join(DRIVES),
        "--frames", args.frames, "--points", args.points], env, log)
    sh([sys.executable, REPO / "scripts" / "converter" / "kitti_odometry.py"],
       env, log)


def ensure_trained(env, args, log):
    models = Path(env["MODEL_PATH"])
    models.mkdir(parents=True, exist_ok=True)
    done = sorted(models.glob("*/ckpt_final_*.msgpack"), key=os.path.getmtime)
    if done:
        exp = done[-1].parent
        print(f"training: finished experiment present: {exp.name}",
              flush=True)
        return exp
    # cross-round resume: a previous (killed) session's checkpoints live in
    # earlier experiment dirs under MODEL_PATH — continue from the newest
    # real checkpoint instead of restarting the 50k schedule
    ckpts = [c for c in models.glob("*/ckpt*.msgpack") if not c.is_symlink()]
    resume = max(ckpts, key=os.path.getmtime) if ckpts else None

    cfg_path = Path(args.workdir) / "train_long.yaml"
    cfg = {
        "extends": str(REPO / "configs" / "training"
                       / "kitti_synth_long.yaml"),
        "identifier": "long_ema",
        "seed": int(args.seed),
        "data": {
            "training": [
                str(Path(env["KITTI_PATH"]) / "odometry" / f"{s}.pack")
                for s in ("00", "01", "02", "05", "06")
            ],
            "validation": str(Path(env["KITTI_PATH"]) / "odometry"
                              / "04.pack"),
        },
        "optimizer": {"weight_ema_decay": float(args.ema_decay)},
    }
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cmd = [sys.executable, REPO / "scripts" / "train_supervised.py",
           cfg_path, "--rss-limit-gb", args.rss_limit_gb]
    if resume is not None:
        print(f"resuming from {resume}", flush=True)
        cmd += ["--ckpt", resume]
    sh(cmd, env, log)
    done = sorted(models.glob("*/ckpt_final_*.msgpack"), key=os.path.getmtime)
    assert done, "training finished but no final checkpoint"
    return done[-1].parent


def run_arm(arm, weights_file, exp, env, args, log):
    out_base = Path(args.workdir) / f"runs_{arm}"
    runs = [d for d in out_base.glob("*") if (d / "scenario.yaml").exists()]
    if not runs:
        sh([sys.executable, REPO / "scripts" / "inference.py",
            REPO / "configs" / "scenarios" / "kitti_synth_test.yaml",
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/repo/.studies/long50k")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ema-decay", type=float, default=0.999)
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
    report = {"recipe": "kitti_synth_long + weight EMA",
              "seed": args.seed, "ema_decay": args.ema_decay,
              "experiment": exp.name}
    report["raw"] = run_arm("raw", "weights.msgpack", exp, env, args, log)
    with open(wd / "long_study.json", "w") as f:
        json.dump(report, f, indent=2)
    report["ema"] = run_arm("ema", "weights_ema.msgpack", exp, env, args,
                            log)
    with open(wd / "long_study.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
