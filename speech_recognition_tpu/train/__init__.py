from .checkpoint import latest_checkpoint, restore_weights, save_weights
from .schedule import linear_warmup_decay
from .state import TrainState, make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "latest_checkpoint",
    "linear_warmup_decay",
    "make_eval_step",
    "make_train_step",
    "restore_weights",
    "save_weights",
]
