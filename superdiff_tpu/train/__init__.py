from .state import TrainState
from .trainer import make_optimizer, make_train_step, init_train_state
from . import checkpoints

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "init_train_state",
    "checkpoints",
]
