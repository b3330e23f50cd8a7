#!/usr/bin/env python3
"""Fused-vs-exact SA drift through the COMPLETE odometry pipeline.

`scripts/parity_fused_exact.py` measures the per-pair drift between the
fused set-abstraction semantics (max over all in-radius points) and the
reference's exact semantics (first-nsample truncation, reference
extern/pointnet2.patch:101-116); this driver measures the same deviation
at the metric level that matters for the "<1% drift on shipped weights"
goal: KITTI segment errors after sequential inference over whole drives
(reference workflow: /root/reference/deepclr/evaluation/evaluator.py:30-64
plus the devkit).

Pipeline (all stock CLIs, run exactly as a user would):
  1. synthesize HDL-64-style drives + convert to packs (skipped if present)
  2. train the fused model (segmented supervisor — leaky-client safe)
  3. run sequential inference TWICE with the SAME weights:
     model.params.fused true vs false (exact path)
  4. evaluation.py + export_kitti_poses.py + C++ devkit on both runs
  5. write a JSON with per-sequence/total t_err & r_err and the deltas

Usage:
  python scripts/parity_fused_exact_e2e.py --workdir /root/e2e_parity \
      [--frames 160] [--train-steps 12000] [--sequences 00,01,04]

Stages are idempotent: re-running skips completed artifacts, so the study
survives container restarts.
"""
import argparse
import json
import os
import re
import shutil
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
            f"command failed rc={proc.returncode} (log: {log}): {cmd}"
        )


def ensure_dataset(env, args, log):
    kitti = Path(env["KITTI_PATH"])
    packs = [kitti / "odometry" / f"{s}.pack" for s in args.sequences]
    if all(p.exists() for p in packs):
        print("dataset: packs present, skipping generation")
        return
    sh([sys.executable, REPO / "scripts" / "make_synthetic_kitti.py",
        kitti, "--sequences", ",".join(args.sequences),
        "--frames", args.frames, "--points", args.points], env, log)
    sh([sys.executable, REPO / "scripts" / "converter" / "kitti_odometry.py"],
       env, log)


def ensure_trained(env, args, log):
    """Train (segmented) unless a finished experiment already exists.
    Returns the experiment directory holding weights.msgpack."""
    models = Path(env["MODEL_PATH"])
    done = sorted(models.glob("*/ckpt_final_*.msgpack"))
    if done:
        exp = done[-1].parent
        print(f"training: finished experiment present: {exp.name}")
        return exp

    cfg_path = Path(args.workdir) / "train_e2e.yaml"
    steps = int(args.train_steps)
    cfg = {
        "extends": str(REPO / "configs" / "training" / "kitti_synth.yaml"),
        "identifier": "e2e_parity",
        "data": {
            "training": [
                str(Path(env["KITTI_PATH"]) / "odometry" / f"{s}.pack")
                for s in args.sequences[:-1]
            ],
            "validation": str(Path(env["KITTI_PATH"]) / "odometry"
                              / f"{args.sequences[-1]}.pack"),
        },
        "optimizer": {"max_iterations": steps},
        # scheduler.params is one leaf dict param: overriding it REPLACES
        # the extends-base dict, so carry the full reference recipe here
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
    done = sorted(models.glob("*/ckpt_final_*.msgpack"),
                  key=os.path.getmtime)
    assert done, "training finished but no final checkpoint found"
    return done[-1].parent


def make_exact_model(exp: Path) -> Path:
    """Clone the experiment's model dir with model.params.fused: false."""
    exact = exp.parent / (exp.name + "_exact")
    if exact.exists():
        shutil.rmtree(exact)
    exact.mkdir()
    for item in ("model_config.yaml", "weights.msgpack"):
        src = exp / item
        shutil.copy(src.resolve(), exact / item)
    with open(exact / "model_config.yaml") as f:
        mc = yaml.load(f, Loader=yaml.Loader)
    mc["params"]["fused"] = False
    with open(exact / "model_config.yaml", "w") as f:
        yaml.safe_dump(mc, f)
    return exact


def run_variant(name, model_name, env, args, log):
    out_base = Path(args.workdir) / f"runs_{name}"
    runs = [d for d in out_base.glob("*") if (d / "scenario.yaml").exists()]
    if not runs:
        sh([sys.executable, REPO / "scripts" / "inference.py",
            REPO / "configs" / "scenarios" / "kitti_synth.yaml",
            model_name, out_base], env, log)
        runs = [d for d in out_base.glob("*") if (d / "scenario.yaml").exists()]
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
    return run_dir


def parse_devkit(run_dir: Path):
    """Devkit stats.txt lines: '<seq|TOTAL> t_err[%] X r_err[deg/m] Y'
    (native/kitti_devkit.cpp:187-194)."""
    out = {}
    for line in (run_dir / "kitti" / "result" / "stats.txt").read_text().splitlines():
        m = re.match(
            r"(\S+)\s+t_err\[%\]\s+([\d.eE+-]+)\s+r_err\[deg/m\]\s+([\d.eE+-]+)",
            line,
        )
        if m:
            out[m.group(1)] = {"t_err_pct": float(m.group(2)),
                               "r_err_deg_per_m": float(m.group(3))}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/e2e_parity")
    ap.add_argument("--sequences", default="00,01,04")
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--train-steps", type=int, default=12000)
    ap.add_argument("--rss-limit-gb", type=float, default=40.0)
    ap.add_argument("--json", default=None,
                    help="output JSON (default WORKDIR/parity_e2e.json)")
    args = ap.parse_args()
    args.sequences = args.sequences.split(",")

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    log = wd / "pipeline.log"

    env = dict(os.environ)
    env.setdefault("KITTI_PATH", str(wd / "kitti"))
    env.setdefault("MODEL_PATH", str(wd / "models"))
    Path(env["MODEL_PATH"]).mkdir(parents=True, exist_ok=True)

    ensure_dataset(env, args, log)
    exp = ensure_trained(env, args, log)
    exact_dir = make_exact_model(exp)

    run_f = run_variant("fused", exp.name, env, args, log)
    run_e = run_variant("exact", exact_dir.name, env, args, log)

    fused = parse_devkit(run_f)
    exact = parse_devkit(run_e)
    report = {
        "train_steps": args.train_steps,
        "experiment": exp.name,
        "fused": fused,
        "exact": exact,
        "delta": {
            k: {
                "t_err_pct": fused[k]["t_err_pct"] - exact[k]["t_err_pct"],
                "r_err_deg_per_m": (fused[k]["r_err_deg_per_m"]
                                    - exact[k]["r_err_deg_per_m"]),
                "t_rel": abs(fused[k]["t_err_pct"] - exact[k]["t_err_pct"])
                         / max(exact[k]["t_err_pct"], 1e-9),
            }
            for k in fused if k in exact
        },
    }
    out = Path(args.json) if args.json else wd / "parity_e2e.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
