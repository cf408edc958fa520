"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP layer
(`/root/reference/lib/utils/comm.py`, `train_net.py:49-56,151-154`): instead
of per-process NCCL ranks with implicit gradient all-reduce, a single
``jax.sharding.Mesh`` with a ``data`` axis spans all chips (ICI within a
slice, DCN across slices).  The train step is written in *global-batch*
semantics: batches are sharded over ``data`` on their leading axis, state is
replicated, and XLA's GSPMD partitioner inserts the psum/all-gather
collectives — including the all-gathered MoCo queue append that the
reference's per-rank queues silently skipped (``broadcast_buffers=False``,
train_net.py:55; SURVEY.md section 2 parallelism table).

A ``model`` axis is reserved for tensor-parallel extensions; at this model
scale it stays size 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: int = 0, devices=None) -> Mesh:
    """Build a (data, model=1) mesh over ``num_data`` devices (0 = all)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data <= 0:
        num_data = len(devices)
    if num_data > len(devices):
        raise ValueError(
            f"Requested data axis of {num_data} but only {len(devices)} "
            f"devices are visible"
        )
    dev_array = np.array(devices[:num_data]).reshape(num_data, 1)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-sharded on axis 0.

    Global batch size must divide the data-axis size (the reference asserts
    the same at build.py:73-88).

    Multi-host: every process holds the same *global* batch (the loaders are
    deterministic in (seed, epoch)), and each contributes only its
    addressable shards via ``make_array_from_callback`` — the JAX-native
    replacement for per-rank DistributedSampler slices
    (reference build.py:45-46).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        out[k] = jax.make_array_from_callback(
            v.shape, sharding, lambda idx, v=v: v[idx]
        )
    return out


def shard_local_batch(local_batch: dict, mesh: Mesh) -> dict:
    """Assemble a global batch-sharded array from *per-process* data.

    Counterpart of :func:`shard_batch` for the per-host shard loader
    (``data.loader.DataLoader(process_shard=...)``): each process supplies
    only the rows its devices own, and JAX stitches them into one global
    array without any host holding (or decoding) the full batch — the
    scalable replacement for the reference's DistributedSampler
    (build.py:45-46).
    """
    sharding = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_batch.items()
    }


def replicate_state(state, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.device_put(state, sharding)


def local_batch_size(global_batch: int, mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return global_batch
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(
            f"Global batch {global_batch} not divisible by data axis {n}"
        )
    return global_batch // n
