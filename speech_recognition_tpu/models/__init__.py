from .deepspeech2 import DeepSpeech2
from .las import LAS
from .model_proto import ModelProto

__all__ = ["DeepSpeech2", "LAS", "ModelProto"]
