"""PointNet++ set-abstraction layers, TPU-native.

Replaces the reference's PointnetSAModuleMSG CUDA module
(/root/reference/deepclr/models/deepclr.py:48-94 wrapping the
sshaoshuai/Pointnet2.PyTorch extension) with a fused XLA program:
FPS -> ball query -> group(+center) -> per-point MLP -> max over the
neighborhood — all fixed-shape and mask-aware.

Layout: channel-last.  A cloud is ``(B, N, 3)`` xyz + optional ``(B, N, C)``
features + ``(B, N)`` bool validity mask.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .. import ops
from .layers import MLP

__all__ = ["SetAbstractionMSG"]


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    Attributes mirror the reference config schema
    (configs/training/kitti_base.yaml:20-26): one npoint with per-scale
    radii / nsamples / mlps.  ``use_xyz`` prepends centered xyz to the
    grouped features before the MLP, as the CUDA QueryAndGroup does.
    """

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def output_feat_dim(self) -> int:
        return int(sum(m[-1] for m in self.mlps))

    @nn.compact
    def __call__(
        self,
        xyz,
        features=None,
        mask=None,
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (new_xyz (B, npoint, 3), new_features (B, npoint, F))."""
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)

        fps_idx = ops.furthest_point_sample(xyz, self.npoint, mask=mask)
        new_xyz = ops.gather_points(xyz, fps_idx)  # (B, P, 3)

        scale_feats = []
        for si, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx = ops.ball_query(xyz, new_xyz, float(radius), int(nsample), mask=mask)
            grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
            if features is not None:
                grouped_feat = ops.group_points(features, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
                else:
                    grouped = grouped_feat
            else:
                grouped = grouped_xyz

            h = MLP(
                tuple(mlp),
                batch_norm=self.batch_norm,
                compute_dtype=self.compute_dtype,
                kernel_init_name="kaiming_normal",
                name=f"mlp_scale_{si}",
            )(grouped, train=train)
            scale_feats.append(jnp.max(h, axis=-2))  # (B, P, mlp[-1])

        return new_xyz, jnp.concatenate(scale_feats, axis=-1).astype(jnp.float32)
