"""Cross-cutting utilities (L0): config, logging, checkpoints, seeding."""
from .checkpoints import (
    checkpoint_exists,
    latest_step_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from .config import DEFAULT_CONFIG, load_config, save_config
from .logging import Logger, MetricsTracker, TensorBoardLogger

__all__ = [
    "DEFAULT_CONFIG",
    "Logger",
    "MetricsTracker",
    "TensorBoardLogger",
    "checkpoint_exists",
    "latest_step_checkpoint",
    "load_checkpoint",
    "load_config",
    "save_checkpoint",
    "save_config",
]
