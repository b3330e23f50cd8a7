"""Multi-host (pod) runtime helpers.

On a TPU pod each host runs the same program; jax.distributed wires the
hosts into one runtime. The data loader shards its sample stream per host
(`loader.DataLoader(shard_index=..., num_shards=...)` via config or these
helpers), each host feeds its local devices, and the jitted DP step's psum
runs over ICI/DCN — no NCCL/MPI analog needed.
"""
from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "process_index", "process_count", "is_primary"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
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
        )
    except RuntimeError:
        # already initialized
        pass


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """rank-0 check for logging / checkpoint writes."""
    return jax.process_index() == 0
