"""Shared MLP building blocks.

TPU-first translation of the reference layer helpers
(/root/reference/deepclr/models/helper.py:11-123): the reference's 1x1
Conv1d/Conv2d stacks are, mathematically, per-point Dense layers — here they
are exactly that, applied to channel-last tensors so XLA lowers them to large
MXU matmuls over the flattened point axes.

Contracts kept from the reference:
  * ReLU after *every* layer (including the last of a stack),
  * order conv -> batchnorm -> relu,
  * xavier-uniform weight init, zero bias,
  * dropout is parameterized by keep-probability (``dropout_keep``), applied
    after every hidden layer, and after the last layer iff ``dropout_last``.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["MLP"]


class MLP(nn.Module):
    """Stack of per-point Dense+ReLU layers (channel-last).

    Works on any rank: (..., C_in) -> (..., C_out).  The matmuls run in
    ``compute_dtype`` (bf16 by default on TPU); parameters stay float32.
    """

    features: Sequence[int]
    batch_norm: bool = False
    dropout_keep: float = 1.0
    dropout_last: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    kernel_init_name: str = "xavier_uniform"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.kernel_init_name == "xavier_uniform":
            kinit = nn.initializers.xavier_uniform()
        elif self.kernel_init_name == "kaiming_normal":
            kinit = nn.initializers.kaiming_normal()
        else:  # pragma: no cover
            raise ValueError(self.kernel_init_name)

        n_layers = len(self.features)
        x = x.astype(self.compute_dtype)
        for i, width in enumerate(self.features):
            x = nn.Dense(
                width,
                kernel_init=kinit,
                bias_init=nn.initializers.zeros,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=f"dense_{i}",
            )(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
            is_last = i == n_layers - 1
            if self.dropout_keep < 1.0 and (not is_last or self.dropout_last):
                x = nn.Dropout(
                    rate=1.0 - self.dropout_keep, deterministic=not train,
                    name=f"dropout_{i}",
                )(x)
        return x
