from .checkpoint import Checkpointer, restore_checkpoint
from .trainer import (
    TrainState,
    create_train_state,
    install_sigint_handler,
    make_eval_step,
    make_train_step,
    run_trainer,
    train,
)

__all__ = [
    "Checkpointer",
    "restore_checkpoint",
    "TrainState",
    "create_train_state",
    "install_sigint_handler",
    "make_train_step",
    "make_eval_step",
    "run_trainer",
    "train",
]
