from .model import ModelForTraining
from .optimizer import get_optimizer
from .scheduler import get_lr_schedule
from .trainer import Trainer

__all__ = ["ModelForTraining", "Trainer", "get_optimizer", "get_lr_schedule"]
