from ess_tpu.core.config import (
    Config,
    DatasetConfig,
    EventDatasetConfig,
    ImageDatasetConfig,
    ModelConfig,
    OptimConfig,
    TaskConfig,
    CheckpointConfig,
    HardwareConfig,
    load_config,
)
from ess_tpu.core import labels

__all__ = [
    "Config",
    "DatasetConfig",
    "EventDatasetConfig",
    "ImageDatasetConfig",
    "ModelConfig",
    "OptimConfig",
    "TaskConfig",
    "CheckpointConfig",
    "HardwareConfig",
    "load_config",
    "labels",
]
