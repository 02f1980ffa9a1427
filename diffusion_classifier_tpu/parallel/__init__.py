from .mesh import (
    batch_sharding,
    host_local_batch_size,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "host_local_batch_size",
]
