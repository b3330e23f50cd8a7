"""Device transfer helpers (reference deepclr/utils/tensor.py)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = ["prepare_tensor"]


def prepare_tensor(x: Any, device: Optional[Any] = None,
                   sharding: Optional[Any] = None) -> Any:
    """Move an array (or pytree of arrays) to a device / sharding."""
    target = sharding if sharding is not None else device

    def put(v):
        if isinstance(v, (np.ndarray, jax.Array)):
            return jax.device_put(v, target)
        return v

    return jax.tree_util.tree_map(put, x)
