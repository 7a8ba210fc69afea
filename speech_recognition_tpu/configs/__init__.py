from .data_config import ConfigValidationError, DataConfig, SpecAugmentConfig
from .model_config import DeepSpeechConfig, LASConfig, ModelConfig, get_model_config
from .train_config import TrainConfig

__all__ = [
    "ConfigValidationError",
    "DataConfig",
    "SpecAugmentConfig",
    "DeepSpeechConfig",
    "LASConfig",
    "ModelConfig",
    "TrainConfig",
    "get_model_config",
]
