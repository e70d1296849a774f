from hint_tpu.train.optim import make_optimizer, lr_schedule, init_trainables
from hint_tpu.train.trainer import Trainer, TrainState

__all__ = ["make_optimizer", "lr_schedule", "init_trainables", "Trainer", "TrainState"]
