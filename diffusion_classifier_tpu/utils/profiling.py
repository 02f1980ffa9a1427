"""Profiling / tracing utilities (SURVEY §5.1 rebuild).

The reference's observability is wall-clock epoch timers
(`diffusion/diffusion_classifier.py:424,455-457`). Here the same timers exist
in the engine, plus first-class device tracing:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA ops, fusion, HBM transfers).
- :func:`timed` — wall-clock a function with ``block_until_ready`` on its
  outputs (correct device timing under async dispatch).
- :class:`StepTimer` — streaming per-step timing with p50/p95 summary.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np

__all__ = ["trace", "timed", "StepTimer", "enable_compilation_cache"]


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): step(...)`` → TensorBoard trace in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, **kwargs):
    """Run ``fn`` and block on its outputs; returns ``(result, seconds)``."""
    t0 = time.perf_counter()
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, time.perf_counter() - t0


class StepTimer:
    """Accumulates per-step wall times; reports mean/p50/p95."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        assert self._t0 is not None, "start() first"
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def measure(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def enable_compilation_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Compiled executables are reused across processes: a training job that
    resumes after preemption, or an inference CLI starting after training,
    skips the 1-5 min remote TPU compile of the big jitted programs
    (measured on this chip: 0.67 s cold -> 0.06 s warm for a probe program).
    Safe to call repeatedly; process-global.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default min-compile-time is 1.0 s, which silently skips caching the
    # many mid-sized bench/eval programs; everything non-trivial is worth
    # persisting when the alternative is a remote recompile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
