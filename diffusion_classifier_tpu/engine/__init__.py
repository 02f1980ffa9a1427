from .classifier import BackboneWithHead, Classifier
from .denoiser import Denoiser, supports_prefix
from .diffusion_classifier import DiffusionClassifier
from .state import EmaConfig, TrainState, init_train_state, make_optimizer

__all__ = [
    "DiffusionClassifier",
    "Classifier",
    "BackboneWithHead",
    "Denoiser",
    "supports_prefix",
    "TrainState",
    "EmaConfig",
    "init_train_state",
    "make_optimizer",
]
