"""PointNet++ feature propagation (FP) module.

Completes the PointNet++ op surface of the reference's native extension
(three_nn / three_interpolate, extern/pointnet2.patch:197-247 and the
upstream PointnetFPModule): upsample features from a sparse point set back to
a dense one via inverse-distance-weighted 3-NN interpolation + unit MLP.
DeepCLR itself does not use FP, but the reference framework ships it as part
of the pointnet2 toolbox.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import three_interpolate, three_nn
from ..ops.interpolate import three_interpolate_weights
from .layers import MLP

__all__ = ["FeaturePropagation"]

class FeaturePropagation(nn.Module):
    """Propagate features from (sparse) known points to (dense) unknown ones.

    mlp: widths of the post-interpolation unit MLP.
    """

    mlp: Sequence[int]
    batch_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats=None,
                 known_feats=None, known_mask=None, *, train: bool = False):
        """Args:
          unknown_xyz: (B, N, 3) dense coordinates.
          known_xyz: (B, M, 3) sparse coordinates.
          unknown_feats: optional (B, N, C1) skip features.
          known_feats: (B, M, C2) features to upsample.
          known_mask: optional (B, M) validity of known points.

        Returns:
          (B, N, mlp[-1]) propagated features.
        """
        dist, idx = three_nn(unknown_xyz, known_xyz, known_mask=known_mask)
        weight = three_interpolate_weights(dist)
        interpolated = three_interpolate(known_feats, idx, weight)

        if unknown_feats is not None:
            interpolated = jnp.concatenate([interpolated, unknown_feats], axis=-1)

        return MLP(
            tuple(self.mlp), batch_norm=self.batch_norm,
            compute_dtype=self.compute_dtype, name="mlp",
        )(interpolated, train=train).astype(jnp.float32)
