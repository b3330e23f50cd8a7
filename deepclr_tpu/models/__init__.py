from .base import ModelInferenceHelper, pad_cloud
from .build import (
    ModelType,
    build_model,
    init_params,
    load_trained_model,
    load_weights,
    save_weights,
)
from .deepclr import DeepCLR

__all__ = [
    "DeepCLR",
    "ModelInferenceHelper",
    "ModelType",
    "build_model",
    "init_params",
    "load_trained_model",
    "load_weights",
    "save_weights",
    "pad_cloud",
]
