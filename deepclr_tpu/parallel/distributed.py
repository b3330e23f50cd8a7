"""Multi-host (pod) runtime helpers.

On a TPU pod each host runs the same program; jax.distributed wires the
hosts into one runtime. ``scripts/training.py`` calls
``maybe_initialize()`` at startup; the trainer shards its data loader per
host (``loader.DataLoader(shard_index=process_index(),
num_shards=process_count())``), gates checkpoint/log/tensorboard writes on
``is_primary()``, and the jitted DP step's psum runs over ICI/DCN — no
NCCL/MPI analog needed.  Environment contract for non-auto-detected
fabrics: ``DEEPCLR_COORDINATOR`` (host:port), ``DEEPCLR_NUM_PROCESSES``,
``DEEPCLR_PROCESS_ID`` (or the standard Cloud TPU / SLURM auto-detection
that ``jax.distributed.initialize()`` performs with no arguments).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize", "maybe_initialize", "process_index", "process_count",
           "is_primary"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[list] = None) -> None:
    """Initialize the jax distributed runtime (no-op when single-process).

    On Cloud TPU pods the arguments are auto-detected; pass them explicitly
    for other fabrics.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError:
        # already initialized
        pass


def maybe_initialize() -> bool:
    """Join the multi-host runtime when the environment asks for it.

    Returns True when a multi-process runtime was (or already is) active.
    Explicit env contract first (``DEEPCLR_COORDINATOR`` + friends), then
    jax's own auto-detection when ``DEEPCLR_DISTRIBUTED=1`` (Cloud TPU pod
    metadata, SLURM, ...).  Single-host launches hit neither branch and pay
    nothing.
    """
    coord = os.environ.get("DEEPCLR_COORDINATOR")
    if coord:
        nproc = int(os.environ["DEEPCLR_NUM_PROCESSES"])
        pid = int(os.environ["DEEPCLR_PROCESS_ID"])
        local = os.environ.get("DEEPCLR_LOCAL_DEVICE_IDS")
        initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid,
            local_device_ids=(
                [int(x) for x in local.split(",")] if local else None
            ),
        )
        return nproc > 1
    if os.environ.get("DEEPCLR_DISTRIBUTED") == "1":
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass
        return True
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """rank-0 check for logging / checkpoint writes."""
    return jax.process_index() == 0
