from .mesh import batch_sharding, make_mesh, replicate_sharding, shard_batch

__all__ = ["make_mesh", "shard_batch", "batch_sharding", "replicate_sharding"]
