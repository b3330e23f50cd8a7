"""Model zoo plumbing: registry, build_model, load/save weights.

Mirrors the reference contracts (/root/reference/deepclr/models/build.py:14-49
and the config-driven module factory at models/deepclr.py:412-427) with a
functional twist: ``build_model`` returns an *unbound* flax module; parameters
live in a separate pytree created by ``init_params`` or loaded from disk.
"""
from __future__ import annotations

import enum
import os
import os.path as osp
from typing import Dict, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp

from ..geometry import LabelType
from .deepclr import (
    AccumulatedLoss,
    DeepCLR,
    MotionEmbedding,
    OutputSimple,
    SetAbstraction,
    TransformLoss,
    TransformUncertaintyLoss,
)

__all__ = [
    "ModelType",
    "build_model",
    "init_params",
    "save_weights",
    "load_weights",
    "load_trained_model",
]


class ModelType(enum.Enum):
    DEEPCLR = "deepclr"

    @classmethod
    def create(cls, value) -> "ModelType":
        if isinstance(value, cls):
            return value
        return cls(str(value).lower())


_MODULES = {
    "SetAbstraction": SetAbstraction,
    "MotionEmbedding": MotionEmbedding,
    "OutputSimple": OutputSimple,
}

_LOSSES = {
    "TransformLoss": TransformLoss,
    "TransformUncertaintyLoss": TransformUncertaintyLoss,
}

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


def _get(cfg, key, default=None):
    """Dict-or-attr access so plain dicts and Config trees both work."""
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def _to_plain(obj):
    if hasattr(obj, "to_dict"):
        return obj.to_dict()
    return obj


def build_model(model_cfg) -> DeepCLR:
    """Construct the (unbound) model from a model config tree.

    Expects the reference's model_config.yaml schema: input_dim, point_dim,
    label_type, model_type, params{batch_norm, dropout, cloud_features,
    merge, output[, loss][, compute_dtype]}.
    """
    model_type = ModelType.create(_get(model_cfg, "model_type"))
    if model_type != ModelType.DEEPCLR:  # pragma: no cover
        raise NotImplementedError(model_type)

    label_type = LabelType.create(_get(model_cfg, "label_type"))
    input_dim = int(_get(model_cfg, "input_dim", 3))
    point_dim = int(_get(model_cfg, "point_dim", 3))
    params = _to_plain(_get(model_cfg, "params")) or {}

    batch_norm = bool(params.get("batch_norm", False))
    dropout_keep = float(params.get("dropout", 1.0))
    compute_dtype = _DTYPES[str(params.get("compute_dtype", "float32"))]
    common = dict(batch_norm=batch_norm, compute_dtype=compute_dtype)

    cf = _to_plain(params["cloud_features"])
    if cf["name"] != "SetAbstraction":  # pragma: no cover
        raise NotImplementedError(cf["name"])
    cloud_features = SetAbstraction(
        fused=bool(params.get("fused", True)),
        presorted=bool(params.get("presorted", False)),
        **cf.get("params", {}), **common,
    )

    mg = _to_plain(params["merge"])
    if mg["name"] != "MotionEmbedding":  # pragma: no cover
        raise NotImplementedError(mg["name"])
    merge = MotionEmbedding(point_dim=point_dim, **mg.get("params", {}), **common)

    out = _to_plain(params["output"])
    if out["name"] != "OutputSimple":  # pragma: no cover
        raise NotImplementedError(out["name"])
    output = OutputSimple(
        label_type=label_type, dropout_keep=dropout_keep,
        **out.get("params", {}), **common,
    )

    loss_cfg = params.get("loss")
    loss_module = None
    if loss_cfg is not None:
        def make_loss(lc):
            lc = _to_plain(lc)
            return _LOSSES[lc["name"]](label_type=label_type, **lc.get("params", {}))

        if isinstance(loss_cfg, (list, tuple)):
            loss_module = AccumulatedLoss(tuple(make_loss(lc) for lc in loss_cfg))
        else:
            loss_module = make_loss(loss_cfg)

    return DeepCLR(
        cloud_features=cloud_features,
        merge=merge,
        output=output,
        loss_module=loss_module,
        input_dim=input_dim,
        point_dim=point_dim,
        label_type=label_type,
    )


def init_params(model: DeepCLR, rng, num_points: int = 2048,
                batch_size: int = 1) -> Dict:
    """Initialize parameters with dummy fixed-shape inputs."""
    dummy = jnp.zeros((batch_size, num_points, model.input_dim), jnp.float32)
    y = jnp.zeros((batch_size, model.label_type.dim), jnp.float32)
    variables = model.init(rng, dummy, dummy, y=y)
    return variables


def save_weights(path: str, variables: Dict) -> None:
    """Serialize a variables pytree (msgpack, flax canonical format)."""
    data = flax.serialization.to_bytes(variables)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_weights(path: str, template: Optional[Dict] = None) -> Dict:
    """Load a variables pytree; validated against ``template`` if given."""
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return flax.serialization.from_bytes(template, data)
    return flax.serialization.msgpack_restore(data)


def load_trained_model(model_cfg, weights_path: Optional[str] = None,
                       rng: Optional[jax.Array] = None,
                       num_points: int = 2048) -> Tuple[DeepCLR, Dict]:
    """Build the model and load its weights (reference load_trained_model).

    Falls back to fresh init when no weights path is provided (useful for
    timing runs with untrained models, cf. scripts/timing.py).
    """
    model = build_model(model_cfg)
    weights_path = weights_path or _get(model_cfg, "weights")
    if weights_path is not None and osp.exists(str(weights_path)):
        variables = init_params(
            model, rng if rng is not None else jax.random.PRNGKey(0), num_points
        )
        variables = load_weights(str(weights_path), variables)
    else:
        variables = init_params(
            model, rng if rng is not None else jax.random.PRNGKey(0), num_points
        )
    return model, variables
