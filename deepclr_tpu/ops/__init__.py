"""Point-cloud primitive ops (the TPU-native replacement of the reference's
CUDA extension layer, cf. /root/reference/extern/pointnet2.patch:32-35 and
torch_cluster.knn).

Every op is batched, fixed-shape, and mask-aware:
  * clouds are padded to a static N and carry a boolean validity mask,
  * index outputs always have static shapes; semantics of padding slots
    follow the reference kernels (duplicate-first for ball query, index 0
    when nothing matches).

Two implementation tiers share one public signature:
  * ``*_xla``  — pure jax.lax/jnp reference implementations (run anywhere),
  * Pallas TPU kernels registered for the hot ops (FPS, kNN, ball query)
    selected automatically on TPU backends.
"""
from .fused_sa import ball_mlp_max, ball_mlp_max_xla, multi_scale_bundle
from .pairwise import pairwise_sqdist
from .fps import furthest_point_sample
from .ball_query import ball_query
from .knn import knn
from .grouping import gather_points, group_points
from .interpolate import three_nn, three_interpolate

__all__ = [
    "ball_mlp_max",
    "ball_mlp_max_xla",
    "multi_scale_bundle",
    "pairwise_sqdist",
    "furthest_point_sample",
    "ball_query",
    "knn",
    "gather_points",
    "group_points",
    "three_nn",
    "three_interpolate",
]
