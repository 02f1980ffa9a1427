from .config import ExperimentConfig, load_config
from .metrics import F1, Accuracy, Metric, Precision, Recall

__all__ = [
    "ExperimentConfig",
    "load_config",
    "Metric",
    "Accuracy",
    "Precision",
    "Recall",
    "F1",
]
