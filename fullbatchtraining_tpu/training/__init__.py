"""Training core: jitted full-batch/stochastic steps, optimizers, grad-reg."""

from .training import TrainState, make_train_functions, train
from .optimizers import make_lr_schedule, optim_interface

__all__ = ["TrainState", "make_train_functions", "train", "optim_interface",
           "make_lr_schedule"]
