"""Device mesh and sharding layout for distributed training.

The reference scales with HF Accelerate → DDP → NCCL (SURVEY §2.3); here the
equivalent is declarative: one `jax.sharding.Mesh`, batch sharded over the
``'data'`` axis, parameters replicated, and XLA inserting the gradient
``psum`` over ICI/DCN inside the jitted train step. Multi-host entry goes
through `jax.distributed.initialize()`.

An optional ``'model'`` mesh axis is supported for tensor-parallel sharding of
the largest layers (not needed at reference model sizes ≤130M params —
SURVEY §2.3 — but the layout hooks are first-class so larger backbones shard
without restructuring).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "host_local_batch_size",
]


def init_distributed() -> None:
    """Multi-host init (no-op on a single process). Call before device queries."""
    if (
        jax.process_count() == 1
        and os.environ.get("JAX_COORDINATOR_ADDRESS") is None
    ):
        return
    jax.distributed.initialize()  # pragma: no cover - needs a real cluster


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``('data', 'model')`` mesh; ``data`` defaults to all devices / model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        assert len(devices) % model == 0
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Pytree of host arrays → global jax.Arrays, leading axis over 'data'.

    Single-process: a plain sharded ``device_put``. Multi-process: each host
    holds only its slice of the global batch (the loaders' per-process
    sharding, reference DDP semantics via ``accelerate.prepare``,
    `diffusion/diffusion_classifier.py:375-386`), and the global array is
    assembled from the process-local shards — rows are laid out in process
    order, matching the loaders' contiguous per-rank slices.
    """
    n = jax.process_count()
    if n == 1:
        return jax.tree.map(
            lambda a: jax.device_put(a, batch_sharding(mesh, a.ndim)), batch
        )

    def put(a):  # pragma: no cover - needs a real multi-process run
        a = np.asarray(a)
        global_shape = (a.shape[0] * n,) + a.shape[1:]
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, a.ndim), a, global_shape
        )

    return jax.tree.map(put, batch)


def host_local_batch_size(global_batch: int) -> int:
    """Per-host slice of the global batch (even split across processes)."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes"
    )
    return global_batch // n


def local_rows(arr) -> np.ndarray:
    """Process-local rows of a 'data'-sharded global array, as numpy.

    Single-process (fully addressable) arrays come back whole, so eval code
    can pair model outputs with the host-local batch rows the loader
    produced regardless of process count. Metric counters computed from
    these local rows are then summed across processes by
    ``Metric.sync_across_processes`` (allgather), mirroring the reference's
    ``accelerator.reduce`` (`utils/metrics.py:56-58`).
    """
    if isinstance(arr, np.ndarray) or arr.is_fully_addressable:
        return np.asarray(arr)
    # Dedup shards covering the same row range: under a model axis > 1 (TP)
    # or a compiler-replicated output, several local devices hold identical
    # copies of each row slice — concatenating them all would double-count
    # rows against the loader's host-local batch.
    seen = set()  # pragma: no cover - needs a real multi-process run
    shards = []
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start in seen:
            continue
        seen.add(start)
        shards.append(s)
    shards.sort(key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
