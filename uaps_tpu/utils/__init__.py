"""Runtime utilities: config tree, checkpointing, logging."""
from uaps_tpu.utils.config import (
    Config, DataConfig, ModelConfig, MethodConfig, OptimConfig, RunConfig,
    preset, PRESETS,
)

__all__ = ["Config", "DataConfig", "ModelConfig", "MethodConfig",
           "OptimConfig", "RunConfig", "preset", "PRESETS"]
