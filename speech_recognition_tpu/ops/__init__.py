from . import features
from .features import delta_accelerate, linear_to_mel_weight_matrix, stft
from .spec_augment import make_spec_augment

__all__ = [
    "features",
    "delta_accelerate",
    "linear_to_mel_weight_matrix",
    "stft",
    "make_spec_augment",
]
