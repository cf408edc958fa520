from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
    shard_state,
    tp_spec,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "replicate_state",
    "shard_state",
    "tp_spec",
    "local_batch_size",
]
