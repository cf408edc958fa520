from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "replicate_state",
    "local_batch_size",
]
