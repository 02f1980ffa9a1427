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
    "preemption_sync_active",
]


def _init_preemption_sync() -> None:
    """Start the distributed runtime's preemption sync manager.

    The manager registers the SIGTERM preemption notice at the runtime level
    and lets every rank agree on one safe step to checkpoint at
    (``multihost_utils.reached_preemption_sync_point``) — the coordination
    the engine's single-process Python signal handler cannot provide once
    ranks dispatch steps independently (a rank saving one step ahead of its
    peer deadlocks both: the peer's in-flight collective never completes).
    Best-effort: runtimes without the manager fall back to the Python
    handler path.
    """
    try:
        from jax._src import distributed

        if (
            distributed.global_state.client is not None
            and distributed.global_state.preemption_sync_manager is None
        ):
            distributed.global_state.initialize_preemption_sync_manager()
    except Exception as e:  # pragma: no cover - runtime without the manager
        import warnings

        warnings.warn(f"preemption sync manager unavailable: {e!r}")


def preemption_sync_active() -> bool:
    """True when the runtime-level preemption sync manager is running."""
    try:
        from jax._src import distributed

        return distributed.global_state.preemption_sync_manager is not None
    except Exception:  # pragma: no cover
        return False


def init_distributed() -> None:
    """Multi-host init (no-op on a single process). Call before device queries.

    Cluster shape comes from the standard ``JAX_COORDINATOR_ADDRESS`` plus our
    explicit ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars when set
    (SLURM/OMPI auto-detection otherwise) — the TPU-native stand-in for the
    reference's Accelerate/NCCL process-group bootstrap
    (`diffusion/diffusion_classifier.py:375-386`). Exercised for real by the
    2-process CPU cluster in `tests/test_multiprocess.py`.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        # No explicit coordinator. Hand off to JAX's own cluster
        # auto-detection only when the launcher env proves this process IS
        # one task of a multi-task step — an unconditional initialize()
        # would hang waiting for peers that never connect. SLURM_NTASKS
        # alone is NOT proof: a bare `python train.py` inside `salloc -n 4`
        # inherits it without being srun-launched, so additionally require
        # SLURM_PROCID (set per-task by srun only). OMPI_COMM_WORLD_SIZE is
        # set per-rank by mpirun, so it is its own proof. Deliberately NOT
        # querying jax.process_count() here: that would initialize the XLA
        # backend, after which jax.distributed.initialize refuses to run.
        world = 1
        if "SLURM_PROCID" in os.environ:
            world = int(os.environ.get("SLURM_NTASKS") or 1)
        if world == 1:
            world = int(os.environ.get("OMPI_COMM_WORLD_SIZE") or 1)
        if world > 1:
            jax.distributed.initialize()
            _init_preemption_sync()
        return
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(n) if n is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    _init_preemption_sync()


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
    # Dedup shards covering the same index range: under a model axis > 1 (TP)
    # or a compiler-replicated output, several local devices hold identical
    # copies of each row slice — concatenating them all would double-count
    # rows against the loader's host-local batch. Dedup keys on the FULL
    # index tuple so an array sharded along a non-batch axis (distinct
    # index[1:], identical index[0]) errors loudly below instead of being
    # silently truncated to one shard.
    def _key(s):
        return tuple(
            (sl.start or 0, sl.stop) for sl in s.index
        )

    seen = set()
    shards = []
    for s in arr.addressable_shards:
        k = _key(s)
        if k in seen:
            continue
        seen.add(k)
        shards.append(s)
    for s in shards:
        for d, sl in enumerate(s.index[1:], start=1):
            if (sl.start or 0) != 0 or (sl.stop is not None and sl.stop != arr.shape[d]):
                raise ValueError(
                    "local_rows requires sharding along the batch axis only; "
                    f"got a shard covering {s.index} of global {arr.shape}"
                )
    shards.sort(key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
