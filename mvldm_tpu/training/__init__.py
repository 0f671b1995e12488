from .optim import build_lr_schedule, build_optimizer, ema_update
from .trainer import TrainState, Trainer, make_train_step

__all__ = [
    "TrainState",
    "Trainer",
    "build_lr_schedule",
    "build_optimizer",
    "ema_update",
    "make_train_step",
]
