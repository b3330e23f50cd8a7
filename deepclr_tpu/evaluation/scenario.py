"""Evaluation scenario configs (reference deepclr/evaluation/scenario.py)."""
from __future__ import annotations

from ..config.config import Config
from ..data.types import DatasetType
from ..utils.path import expand_path

__all__ = ["load_scenario"]


def load_scenario(filename: str, with_method: bool = False) -> Config:
    """Load a scenario yaml: {name, dataset_type, sequential, data{seq: path},
    method{name, params}}."""
    cfg = Config(allow_dynamic_params=True)
    cfg.define_param("name", required=True)
    cfg.define_param("dataset_type", required=True)
    cfg.define_param("sequential", required=True)
    cfg.define_param("data", required=True)

    method_grp = cfg.define_group("method")
    cfg.define_param("name", parent=method_grp, required=with_method)
    cfg.define_group("params", parent=method_grp)

    cfg.read_file(filename)

    if not cfg.is_valid():
        raise RuntimeError(
            "Configuration is not valid, missing required parameters: "
            + ", ".join(cfg.missing_params())
        )

    cfg.dataset_type = DatasetType.create(cfg.dataset_type)
    cfg.data = {k: expand_path(v) for k, v in cfg.data.items()}

    cfg.freeze()
    return cfg
