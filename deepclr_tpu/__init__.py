"""deepclr_tpu — a TPU-native point-cloud registration framework.

A from-scratch JAX/XLA/Pallas reimagining of the capabilities of DeepCLR
(correspondence-less deep point-cloud registration, arXiv:2007.11255):
end-to-end 6-DoF pose regression between LiDAR / CAD point clouds, with
training, inference, classic-ICP baselines, KITTI-odometry evaluation and
dataset tooling.

Design stance (vs. the CUDA/PyTorch reference):
  * pure-functional models (flax.linen) under a single jit-ed step,
  * fixed shapes + validity masks instead of dynamic cropping,
  * point-cloud primitives (FPS, ball query, kNN, grouping) as batched
    XLA programs with Pallas TPU kernels on the hot path,
  * jax.sharding Mesh + data-parallel collectives instead of host-side
    worker processes,
  * orbax-style checkpointing with the reference's artifact contract.
"""

__version__ = "0.1.0"
