from .factory import factory
from .path import expand_path
from .tensor import prepare_tensor

__all__ = ["expand_path", "factory", "prepare_tensor"]
