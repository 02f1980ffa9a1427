"""Streaming classification metrics as pure counter pytrees.

API parity with the reference metric objects (`utils/metrics.py:5-227`):
``Accuracy/Precision/Recall/F1`` with ``reset / update / compute / get_output /
sync_across_processes``. The implementation is TPU-native instead of
object-mutating torch tensors: each metric holds integer counters in a plain
dict, ``update`` consumes ``(y_pred, batch)`` exactly like the reference, and
cross-process sync is a counter sum — in-graph ``psum`` when used inside a
pjit program, or a host-side sum via `jax.experimental.multihost_utils` when
driven from the eval loop (the analog of ``accelerator.reduce``,
reference `:56-58`).

Precision/Recall/F1 are binary with class 1 as positive, matching the
reference (`:66-227`).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Metric", "Accuracy", "Precision", "Recall", "F1"]


class Metric:
    """Counter-based streaming metric. Subclasses define ``_counters`` and math."""

    counter_names: tuple[str, ...] = ()

    def __init__(self, name: str):
        self.name = name
        self.reset()

    # --- reference-parity surface ---
    def reset(self) -> None:
        self.counters = {k: np.int64(0) for k in self.counter_names}

    def update(self, output) -> None:
        y_pred, batch = output
        y_true = batch["prompt"]
        delta = self._delta(np.asarray(y_pred), np.asarray(y_true))
        for k, v in delta.items():
            self.counters[k] = self.counters[k] + np.int64(v)

    def compute(self) -> Mapping[str, float]:
        raise NotImplementedError

    def get_output(self, reduce: bool = True) -> Mapping[str, float]:
        return self.compute()

    def sync_across_processes(self, reducer=None) -> None:
        """Sum counters across processes.

        ``reducer`` maps a counter dict → summed counter dict. Defaults to
        `multihost_utils.process_allgather` summation when running multi-
        process, else a no-op (single host).
        """
        if reducer is not None:
            self.counters = {
                k: np.int64(v) for k, v in reducer(self.counters).items()
            }
            return
        if jax.process_count() > 1:  # pragma: no cover - needs multi-host
            from jax.experimental import multihost_utils

            # int32 explicitly: jnp.int64 silently downcasts to int32 under
            # the default (disabled) x64 mode anyway; per-process example
            # counts fit comfortably, and the summation below is host int64.
            gathered = multihost_utils.process_allgather(
                {k: jnp.asarray(v, jnp.int32) for k, v in self.counters.items()}
            )
            self.counters = {k: np.int64(np.sum(v)) for k, v in gathered.items()}

    def __call__(self, output):
        self.update(output)
        return self.compute()

    # --- subclass hook ---
    def _delta(self, y_pred: np.ndarray, y_true: np.ndarray) -> Mapping[str, int]:
        raise NotImplementedError


class Accuracy(Metric):
    counter_names = ("correct", "total")

    def _delta(self, y_pred, y_true):
        return {
            "correct": int((y_pred == y_true).sum()),
            "total": int(len(y_true)),
        }

    def compute(self):
        total = self.counters["total"]
        value = self.counters["correct"] / total if total else 0.0
        return {self.name: float(value)}


class Precision(Metric):
    counter_names = ("tp", "fp")

    def __init__(self, name: str = "precision"):
        super().__init__(name)

    def _delta(self, y_pred, y_true):
        return {
            "tp": int(((y_pred == 1) & (y_true == 1)).sum()),
            "fp": int(((y_pred == 1) & (y_true == 0)).sum()),
        }

    def compute(self):
        denom = self.counters["tp"] + self.counters["fp"]
        value = self.counters["tp"] / denom if denom else 0.0
        return {self.name: float(value)}


class Recall(Metric):
    counter_names = ("tp", "fn")

    def __init__(self, name: str = "recall"):
        super().__init__(name)

    def _delta(self, y_pred, y_true):
        return {
            "tp": int(((y_pred == 1) & (y_true == 1)).sum()),
            "fn": int(((y_pred == 0) & (y_true == 1)).sum()),
        }

    def compute(self):
        denom = self.counters["tp"] + self.counters["fn"]
        value = self.counters["tp"] / denom if denom else 0.0
        return {self.name: float(value)}


class F1(Metric):
    counter_names = ("tp", "fp", "fn")

    def __init__(self, name: str = "f1"):
        super().__init__(name)

    def _delta(self, y_pred, y_true):
        return {
            "tp": int(((y_pred == 1) & (y_true == 1)).sum()),
            "fp": int(((y_pred == 1) & (y_true == 0)).sum()),
            "fn": int(((y_pred == 0) & (y_true == 1)).sum()),
        }

    def compute(self):
        num = 2.0 * self.counters["tp"]
        denom = num + self.counters["fp"] + self.counters["fn"]
        value = num / denom if denom else 0.0
        return {self.name: float(value)}
