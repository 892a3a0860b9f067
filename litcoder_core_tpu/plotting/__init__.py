"""Observability layer: experiment loggers and brain plotting."""

from litcoder_core_tpu.plotting.plotting_utils import (
    Logger,
    NullLogger,
    TensorBoardLogger,
    WandBLogger,
    BrainPlotter,
)

__all__ = [
    "Logger", "NullLogger", "TensorBoardLogger", "WandBLogger", "BrainPlotter",
]
