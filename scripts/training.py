#!/usr/bin/env python3
"""Model training (CLI parity with reference scripts/training.py)."""
import argparse
import faulthandler
import signal

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deepclr_tpu.config import Mode, load_config
from deepclr_tpu.engine import install_sigint_handler, train
from deepclr_tpu.parallel import maybe_initialize


def main():
    # stall diagnosis: `kill -USR1 <pid>` dumps every thread's stack to
    # stderr without disturbing the run (long-run jobs on relayed TPU
    # backends can block in device fetches; this shows where)
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    # interrupt contract: ONE shutdown-aware SIGINT handler, installed
    # before any work and never displaced — raises KeyboardInterrupt while
    # the run is live, downgrades to a log line once the resumable state
    # is persisted.  run_trainer recognizes this handler as its own and
    # leaves it installed, so no teardown instant is unprotected.
    install_sigint_handler()
    # multi-host pod launch: join the jax distributed runtime when the
    # environment asks for it (DEEPCLR_COORDINATOR / DEEPCLR_DISTRIBUTED);
    # single-host launches pay nothing
    maybe_initialize()
    parser = argparse.ArgumentParser(description="Model training.")
    parser.add_argument("config", type=str, help="training configuration (*.yaml)")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint for continuing training")
    args = parser.parse_args()

    mode = Mode.NEW if args.ckpt is None else Mode.CONTINUE
    cfg = load_config(args.config, mode, ckpt_filename=args.ckpt)
    train(cfg)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        signal.signal(signal.SIGINT, signal.SIG_IGN)
        print("Interrupted by user")
    finally:
        # The trainer persists a resumable checkpoint on interrupt and its
        # in-loop handler absorbs SIGINT once shutdown starts
        # (engine/trainer.py). A signal landing after that handler is
        # restored — during writer teardown or interpreter exit — must not
        # flip the exit status either: from here on, ignore it.
        signal.signal(signal.SIGINT, signal.SIG_IGN)
