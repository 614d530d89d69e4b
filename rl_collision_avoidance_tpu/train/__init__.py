from .trainer import Trainer, TrainConfig, TrainState

__all__ = ["Trainer", "TrainConfig", "TrainState"]
