#!/usr/bin/env python3
"""Segmented training driver: run training in supervised subprocesses,
restarting from the latest checkpoint when the child's host RSS crosses a
cap or the child dies.

Why this exists: long runs on hosts whose accelerator client leaks host
memory per transfer (observed on relayed-PJRT dev containers: ~one batch
of RSS per step, unreclaimable, 50k iterations -> OOM kill) need their
lifetime bounded per process.  The stock contracts already compose into a
fix — SIGINT makes the trainer save a ``ckpt_interrupt_*`` checkpoint and
exit cleanly (engine/trainer.py), and ``--ckpt`` resumes full state
(optimizer incl. lookahead slow weights, EMAs, RNG, iteration) — this
wrapper just automates the loop.  It is also a blunt elastic-recovery
layer: a child killed by the OOM reaper or a crashed device claim resumes
from the last periodic checkpoint instead of losing the run.

Usage:
    train_supervised.py CONFIG.yaml [--ckpt CKPT] [--rss-limit-gb N]
                        [--max-restarts N]

The first segment creates the experiment directory; later segments resume
into new experiment directories (Mode.CONTINUE), exactly as a manual
``--ckpt`` restart would.
"""
import argparse
import glob
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.config import Mode, load_config  # noqa: E402

_TRAINING = str(Path(__file__).resolve().parent / "training.py")


def child_rss_gb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return 0.0


def experiment_dirs(base_dir: str) -> set[str]:
    return {d for d in glob.glob(os.path.join(base_dir, "*")) if os.path.isdir(d)}


def latest_checkpoint(base_dir: str, dirs: set[str] | None = None) -> str | None:
    """Newest non-symlink checkpoint. ``dirs`` restricts the search to the
    experiment directories created by this run's segments — base_dir is the
    shared experiments root, so an unrestricted glob could resume from an
    unrelated experiment's checkpoint (wrong-model resume)."""
    search = sorted(dirs) if dirs is not None else [os.path.join(base_dir, "*")]
    ckpts = [c for d in search for c in glob.glob(os.path.join(d, "ckpt*.msgpack"))]
    ckpts = [c for c in ckpts if not os.path.islink(c)]
    return max(ckpts, key=os.path.getmtime) if ckpts else None


def finished(base_dir: str, dirs: set[str] | None = None) -> bool:
    search = sorted(dirs) if dirs is not None else [os.path.join(base_dir, "*")]
    return any(glob.glob(os.path.join(d, "ckpt_final_*.msgpack")) for d in search)


def main() -> int:
    parser = argparse.ArgumentParser(description="Segmented model training.")
    parser.add_argument("config", type=str)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint to start the first segment from")
    parser.add_argument("--rss-limit-gb", type=float, default=48.0,
                        help="interrupt + restart the child above this RSS")
    parser.add_argument("--max-restarts", type=int, default=50)
    parser.add_argument("--poll-seconds", type=float, default=20.0)
    parser.add_argument("--interrupt-grace-seconds", type=float, default=300.0,
                        help="escalate SIGINT to SIGKILL if the child has "
                             "not exited within this window")
    args = parser.parse_args()

    # resolve the experiment base dir once so restarts can find checkpoints
    mode = Mode.NEW if args.ckpt is None else Mode.CONTINUE
    cfg = load_config(args.config, mode, ckpt_filename=args.ckpt)
    base_dir = str(cfg.base_dir)

    # only ever resume from / declare completion on experiment directories
    # that belong to THIS run: the segments we launch (dir diff around each
    # child) plus the directory of an explicitly given --ckpt
    run_dirs: set[str] = set()
    if args.ckpt:
        run_dirs.add(os.path.dirname(os.path.abspath(args.ckpt)))

    ckpt = args.ckpt
    for restart in range(args.max_restarts + 1):
        cmd = [sys.executable, "-u", _TRAINING, args.config]
        if ckpt:
            cmd += ["--ckpt", ckpt]
        print(f"[supervise] segment {restart}: {' '.join(cmd)}", flush=True)
        pre_dirs = experiment_dirs(base_dir)
        child = subprocess.Popen(cmd)

        interrupted = False
        interrupt_time = 0.0
        while child.poll() is None:
            time.sleep(args.poll_seconds)
            rss = child_rss_gb(child.pid)
            if rss > args.rss_limit_gb and not interrupted:
                print(f"[supervise] RSS {rss:.1f} GB > "
                      f"{args.rss_limit_gb} GB: interrupting for a clean "
                      "checkpoint + restart", flush=True)
                child.send_signal(signal.SIGINT)
                interrupted = True
                interrupt_time = time.monotonic()
            elif interrupted and (time.monotonic() - interrupt_time
                                  > args.interrupt_grace_seconds):
                # child hung in (or ignored) the interrupt-checkpoint save;
                # kill it and resume from the last periodic checkpoint
                print("[supervise] child ignored SIGINT for "
                      f"{args.interrupt_grace_seconds:.0f}s: SIGKILL",
                      flush=True)
                child.kill()
                break
        rc = child.wait()
        run_dirs |= experiment_dirs(base_dir) - pre_dirs

        if rc == 0 and not interrupted and finished(base_dir, run_dirs):
            print("[supervise] training completed", flush=True)
            return 0
        ckpt = latest_checkpoint(base_dir, run_dirs)
        if ckpt is None:
            print(f"[supervise] child exited rc={rc} before any checkpoint; "
                  "giving up", flush=True)
            return rc or 1
        print(f"[supervise] child exited rc={rc}; resuming from {ckpt}",
              flush=True)
    print("[supervise] max restarts exceeded", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
