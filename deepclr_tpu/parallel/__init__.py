from .mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "shard_batch",
    "batch_sharding",
    "replicate_sharding",
]
