from .denoiser import Denoiser
from .diffusion_classifier import DiffusionClassifier
from .state import EmaConfig, TrainState, init_train_state, make_optimizer

__all__ = [
    "DiffusionClassifier",
    "Denoiser",
    "TrainState",
    "EmaConfig",
    "init_train_state",
    "make_optimizer",
]
