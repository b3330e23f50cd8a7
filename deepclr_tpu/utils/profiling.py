"""Profiling helpers.

The reference's tracing story is manual CUDA-event timing
(scripts/inference.py:95-110, scripts/timing.py). The TPU equivalents:

  * ``device_timer`` — wall-clock timing with a forced device sync (on
    relayed TPU backends block_until_ready can return early; fetching to
    host is the only reliable barrier),
  * ``trace`` — a jax profiler trace context producing TensorBoard-viewable
    .xplane dumps (xprof) for kernel-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np

__all__ = ["device_timer", "trace", "sync"]


def sync(x) -> None:
    """Reliable device barrier: fetch one element of every array to host."""
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.device_get(leaf))


@contextlib.contextmanager
def device_timer(label: str = "", result_holder: Optional[dict] = None) -> Iterator[dict]:
    """Time a block including device completion of its outputs.

    Usage:
        with device_timer("step") as t:
            out = step(...)
            sync(out)
        print(t["ms"])
    """
    holder = result_holder if result_holder is not None else {}
    t0 = time.perf_counter()
    yield holder
    holder["ms"] = (time.perf_counter() - t0) * 1000.0
    if label:
        print(f"{label}: {holder['ms']:.2f} ms")


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
