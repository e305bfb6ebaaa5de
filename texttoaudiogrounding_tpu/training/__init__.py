from texttoaudiogrounding_tpu.training.optim import (
    CosineWithWarmup,
    MetricImprover,
    ReduceLROnPlateau,
    build_optimizer,
    set_learning_rate,
)
from texttoaudiogrounding_tpu.training.train_state import TrainState

__all__ = [
    "build_optimizer", "set_learning_rate", "ReduceLROnPlateau",
    "CosineWithWarmup", "MetricImprover", "TrainState",
]
