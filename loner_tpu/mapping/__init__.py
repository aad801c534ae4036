from loner_tpu.mapping.keyframe import KeyFrame
from loner_tpu.mapping.keyframe_manager import KeyFrameManager
from loner_tpu.mapping.mapper import Mapper, load_checkpoint, save_checkpoint
from loner_tpu.mapping.optimizer import Optimizer, OptimizerConfig, PhaseSettings

__all__ = [
    "KeyFrame", "KeyFrameManager", "Mapper", "Optimizer", "OptimizerConfig",
    "PhaseSettings", "load_checkpoint", "save_checkpoint",
]
