from .distributed import (
    initialize,
    is_primary,
    maybe_initialize,
    process_count,
    process_index,
)
from .mesh import (
    allgather_host,
    allgather_host_f64,
    allgather_host_strings,
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    put_replicated,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "allgather_host",
    "allgather_host_f64",
    "allgather_host_strings",
    "make_mesh",
    "make_mesh_for_batch",
    "shard_batch",
    "batch_sharding",
    "replicate_sharding",
    "put_replicated",
    "initialize",
    "maybe_initialize",
    "process_index",
    "process_count",
    "is_primary",
]
