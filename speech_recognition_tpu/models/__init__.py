from .conformer import Conformer
from .deepspeech2 import DeepSpeech2
from .las import LAS
from .model_proto import ModelProto
from .transducer import Transducer

__all__ = ["Conformer", "DeepSpeech2", "LAS", "ModelProto", "Transducer"]
