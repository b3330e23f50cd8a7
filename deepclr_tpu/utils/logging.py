"""Logging: python logger + tensorboard-compatible summary writer.

Reference contract (deepclr/utils/logging.py:10-49): stdout + timestamped
file in the experiment dir; tensorboard scalars/figures.  The writer facade
uses torch.utils.tensorboard when available and otherwise falls back to a
JSONL scalar log (always written, so headless runs keep their metrics).
"""
from __future__ import annotations

import json
import logging
import os
import os.path as osp
import sys
import time
from typing import Optional

__all__ = ["create_logger", "create_summary_writer", "SummaryWriter"]


def create_logger(name: str = "deepclr", save_dir: Optional[str] = None,
                  distributed_rank: int = 0) -> logging.Logger:
    """Stdout + file logger; non-zero ranks stay silent (reference parity)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if distributed_rank > 0:
        return logger
    if logger.handlers:
        return logger

    formatter = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.DEBUG)
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(osp.join(save_dir, f"log_{stamp}.txt"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    return logger


class _JsonlWriter:
    """Minimal scalar sink: one JSON line per scalar event."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(osp.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def add_text(self, tag: str, text: str, step: int = 0) -> None:
        self._f.write(json.dumps({"tag": tag, "text": text, "step": int(step)}) + "\n")

    def add_figure(self, tag: str, figure, step: int = 0) -> None:
        # figures are only persisted by the tensorboard backend
        import matplotlib.pyplot as plt

        plt.close(figure)

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class SummaryWriter:
    """Facade: tensorboard if importable, JSONL fallback, same interface."""

    def __init__(self, logdir: str):
        self._writers = [_JsonlWriter(logdir)]
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._writers.append(TBWriter(logdir))
        except Exception:  # pragma: no cover - tensorboard optional
            pass

    def add_scalar(self, tag, value, step):
        for w in self._writers:
            w.add_scalar(tag, value, step)

    def add_text(self, tag, text, step=0):
        for w in self._writers:
            w.add_text(tag, text, step)

    def add_figure(self, tag, figure, step=0):
        # only the last writer (tensorboard) renders figures; close after
        for w in self._writers[1:]:
            w.add_figure(tag, figure, step)
        import matplotlib.pyplot as plt

        plt.close(figure)

    def flush(self):
        for w in self._writers:
            w.flush()

    def close(self):
        for w in self._writers:
            w.close()


def create_summary_writer(logdir: str) -> SummaryWriter:
    return SummaryWriter(logdir)
