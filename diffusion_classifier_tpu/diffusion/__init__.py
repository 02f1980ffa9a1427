from . import process, schedule
from .classify import make_classifier
from .sampler import make_sampler

__all__ = ["schedule", "process", "make_sampler", "make_classifier"]
