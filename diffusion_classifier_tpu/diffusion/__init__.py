from . import process, schedule

__all__ = ["schedule", "process"]
