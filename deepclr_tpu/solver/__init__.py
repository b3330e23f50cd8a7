from .build import make_optimizer, make_schedule
from .optimizers import gradient_centralization, lookahead, ranger

__all__ = [
    "make_optimizer",
    "make_schedule",
    "ranger",
    "lookahead",
    "gradient_centralization",
]
