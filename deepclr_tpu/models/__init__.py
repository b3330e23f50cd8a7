from .base import BatchedSequentialHelper, ModelInferenceHelper, pad_cloud
from .build import (
    ModelType,
    build_model,
    init_params,
    load_trained_model,
    load_weights,
    save_weights,
)
from .deepclr import DeepCLR
from .feature_propagation import FeaturePropagation

__all__ = [
    "DeepCLR",
    "FeaturePropagation",
    "BatchedSequentialHelper",
    "ModelInferenceHelper",
    "ModelType",
    "build_model",
    "init_params",
    "load_trained_model",
    "load_weights",
    "save_weights",
    "pad_cloud",
]
