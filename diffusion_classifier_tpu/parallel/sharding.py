"""Tensor-parallel parameter sharding rules over the 'model' mesh axis.

The reference has no TP (SURVEY §2.3: DDP only; models are ≤~130M params),
but the mesh here is first-class two-axis ``('data', 'model')`` — these
rules make the 'model' axis real: the big matmul weights of the denoiser
backbones shard Megatron-style (column-parallel into attention/FF, row-
parallel out), and XLA's SPMD partitioner inserts the matching collectives.
Any placement is semantically exact under GSPMD — these rules only choose
WHERE the bytes live — so the TP path needs no bespoke collective code
(the same property the DP axis relies on, `parallel/mesh.py`).

Convolutions and norms stay replicated: at reference model sizes their
weights are small, and channel-sharded convs buy nothing until the FF/attn
weights dominate.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_spec", "shard_params"]

# column-parallel (shard the OUTPUT features): projections whose outputs
# feed a sharded elementwise region (attention heads, GEGLU gate)
_COLUMN = ("to_q", "to_k", "to_v", "proj_in", "encoder_hid_proj", "linear_1")
# row-parallel (shard the INPUT features): projections that immediately
# reduce over the sharded features — XLA emits the psum
_ROW = ("to_out", "proj_out", "linear_2")


def param_spec(path: str, value) -> P:
    """PartitionSpec for one parameter, by flax param-tree path substring."""
    if value.ndim < 2:
        return P()  # biases/scales: replicated
    leaf = path.rsplit("/", 2)
    name = "/".join(leaf[-2:])
    if any(k in name for k in _COLUMN):
        return P(*([None] * (value.ndim - 1)), "model")
    if any(k in name for k in _ROW):
        return P(*([None] * (value.ndim - 2)), "model", None)
    return P()


def shard_params(mesh: Mesh, params):
    """Place a param pytree on ``mesh``: TP rules when the 'model' axis has
    size > 1, plain replication otherwise."""
    if mesh.shape.get("model", 1) == 1:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def place(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_entries)
        spec = param_spec(path, leaf)
        # a dim must be divisible by the axis size to shard it
        for dim, axis in zip(leaf.shape, spec):
            if axis == "model" and dim % mesh.shape["model"] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
