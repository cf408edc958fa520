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

The ``model`` axis carries opt-in Megatron-style tensor parallelism for the
transformer towers (``TPU.MODEL_PARALLEL``): the FFN halves of every
``TransformerBlock`` (``c_fc``/``c_proj`` in both the ViT and the CLIP text
transformer) are sharded column-then-row over ``model`` via GSPMD param
placements alone — ``c_fc`` splits its output features, ``c_proj``
contracts over the split dimension and XLA inserts the partial-sum
``psum`` — so the train/eval step code is untouched.  At the flagship
RN50+bi-GRU scale the axis stays size 1 (tensor parallelism has nothing to
shard in a conv trunk this size); the knob exists for the ViT/full-CLIP
family where the MLPs are ~2/3 of tower FLOPs.

Attention projections stay replicated — considered and rejected, not an
oversight: the blocks keep CLIP's fused ``[q;k;v]`` Dense layout (the
checkpoint's ``in_proj_weight``), and a column split of that 3W output
dim does not tile head-aligned — ``jnp.split(qkv, 3)`` boundaries straddle
GSPMD tiles for any model-axis size not divisible by 3, so the partitioner
inserts a per-block activation reshard (all-gather) between the qkv matmul
and the attention einsum, exactly the communication Megatron's head-local
design exists to avoid.  Making it head-aligned means either per-head
parameter layouts (breaking checkpoint-layout parity and the fused-QKV
Pallas kernel's BlockSpec index maps) or sharding constraints inside the
attention op (breaking the placements-only design).  With FFN-only TP the
replicated remainder is the attention pair (~1/3 of block matmul FLOPs)
plus LN — acceptable at these tower sizes, and revisitable if a
head-aligned QKV layout ever becomes the checkpoint format.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"


def _group_by_slice(devices, num_slices: int):
    """Order ``devices`` so each slice's chips are contiguous.

    Real multi-slice TPU devices carry ``slice_index``; group by it when
    every device has one (and the slice count matches), otherwise fall
    back to contiguous chunks in enumeration order — the right answer for
    the virtual CPU mesh and for the single-slice degenerate case.
    """
    idx = [getattr(d, "slice_index", None) for d in devices]
    if all(i is not None for i in idx) and len(set(idx)) == num_slices:
        order = {s: k for k, s in enumerate(sorted(set(idx)))}
        groups = [[] for _ in range(num_slices)]
        for d, i in zip(devices, idx):
            groups[order[i]].append(d)
        sizes = {len(g) for g in groups}
        if len(sizes) == 1:
            return [d for g in groups for d in g]
    if len(devices) % num_slices != 0:
        raise ValueError(
            f"{len(devices)} devices do not split into {num_slices} "
            "equal slices"
        )
    return list(devices)


def make_mesh(num_data: int = 0, num_model: int = 1, devices=None,
              num_slices: int = 1) -> Mesh:
    """Build the training mesh (``num_data=0`` = fill with all devices).

    Single slice (default): a flat ``(data, model)`` mesh.

    Multi-slice (``num_slices > 1``, SURVEY §5.8 "ICI within a slice, DCN
    across slices"): a hierarchical ``(slice, data, model)`` mesh whose
    OUTER axis is the DCN boundary.  Devices are grouped slice-major (by
    ``slice_index`` on real multi-slice hardware, contiguous chunks on the
    virtual mesh), so the inner ``data``/``model`` axes span only chips of
    one slice: every collective that names ``data`` or ``model`` rides
    ICI, and only collectives naming ``slice`` cross DCN.  Batches shard
    over ``(slice, data)`` jointly (:func:`batch_sharding`), so the
    per-step gradient psum decomposes into a within-slice ICI reduce plus
    ONE cross-slice DCN reduce; ZeRO-1 placements (:func:`zero1_spec`)
    deliberately use only the inner ``data`` axis so the optimizer-state
    rebuild all-gather never leaves a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    num_model = max(int(num_model), 1)
    num_slices = max(int(num_slices), 1)
    if num_slices == 1:
        if num_data <= 0:
            num_data = len(devices) // num_model
        need = num_data * num_model
        if need == 0 or need > len(devices):
            raise ValueError(
                f"Requested a {num_data}x{num_model} (data x model) mesh "
                f"but only {len(devices)} devices are visible"
            )
        dev_array = np.array(devices[:need]).reshape(num_data, num_model)
        return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))

    devices = _group_by_slice(devices, num_slices)
    per_slice = len(devices) // num_slices
    if num_data <= 0:
        num_data = per_slice // num_model
    need = num_data * num_model
    if need == 0 or need > per_slice:
        raise ValueError(
            f"Requested {num_slices} x ({num_data}x{num_model}) "
            f"(slice x data x model) but each slice has only "
            f"{per_slice} devices"
        )
    picked = [d for s in range(num_slices)
              for d in devices[s * per_slice : s * per_slice + need]]
    dev_array = np.array(picked).reshape(num_slices, num_data, num_model)
    return Mesh(dev_array, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def data_axes(mesh: Mesh) -> tuple:
    """Mesh axes the batch shards over: ``(slice, data)`` on a
    hierarchical mesh, ``(data,)`` on a flat one."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def data_shard_count(mesh: Mesh) -> int:
    """Number of batch shards (product of the data-carrying axes)."""
    n = 1
    for a in data_axes(mesh):
        n *= mesh.shape[a]
    return n


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data-carrying axes —
    jointly over ``(slice, data)`` on a hierarchical mesh, so consecutive
    batch shards live within one slice (the reduce is ICI-major)."""
    axes = data_axes(mesh)
    return NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))


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


# Megatron-style FFN split (Shoeybi et al. 2019), expressed purely as GSPMD
# parameter placements.  Rules are keyed on trailing pytree path names so
# they hit the same tensors everywhere they recur — query towers, MoCo EMA
# key towers, and the Adam mu/nu mirrors inside ``opt_state`` (optax state
# reuses the param tree paths).  Everything unmatched stays replicated,
# which keeps the conv trunks, GRU, queues and scalars on the existing
# data-parallel layout.
_TP_RULES = (
    # c_fc [width, 4*width]: split output features over `model`
    (("c_fc", "kernel"), 2, P(None, MODEL_AXIS)),
    (("c_fc", "bias"), 1, P(MODEL_AXIS)),
    # c_proj [4*width, width]: contract over the split dim; GSPMD inserts
    # the psum over `model`.  Its bias stays replicated (added post-psum).
    (("c_proj", "kernel"), 2, P(MODEL_AXIS, None)),
)


# ZeRO-1 (Rajbhandari et al. 2019) optimizer-state sharding, expressed the
# same GSPMD-placements-only way as the FFN split above: the Adam/SGD moment
# mirrors inside ``opt_state`` are committed sharded over the ``data`` axis,
# the elementwise update runs shard-local, and the partitioner inserts the
# all-gather that rebuilds the replicated param delta.  Params, grads and
# the model math are untouched, so numerics are identical to pure data
# parallelism.  Leaves below this element count stay replicated: sharding a
# BN-scale-sized tensor buys bytes nobody needs and costs a collective.
MIN_ZERO1_ELEMS = 8192


def zero1_spec(path, leaf, mesh, min_elems: int = MIN_ZERO1_ELEMS) -> P:
    """PartitionSpec for one ``opt_state`` leaf under ZeRO-1.

    Starts from the tensor-parallel spec (the Adam mirrors of a TP-split
    FFN kernel must keep their ``model``-axis placement) and assigns the
    ``data`` axis to the largest remaining dimension it divides.  Leaves
    with no divisible dimension, scalars, and small tensors stay on the
    TP/replicated placement.

    On a hierarchical multi-slice mesh this deliberately uses ONLY the
    inner ``data`` axis (not ``slice``): the per-step all-gather that
    rebuilds the replicated param delta then stays within a slice (ICI),
    and nothing new crosses DCN — the memory win is per-slice, which is
    where HBM lives anyway.
    """
    base = tp_spec(path, leaf)
    ndim = getattr(leaf, "ndim", 0) or 0
    size = getattr(leaf, "size", 0) or 0
    n = mesh.shape[DATA_AXIS]
    if ndim == 0 or size < min_elems or n <= 1:
        return base
    spec = list(base) + [None] * (ndim - len(base))
    shape = leaf.shape
    for d in sorted(range(ndim), key=lambda d: -shape[d]):
        if spec[d] is None and shape[d] % n == 0:
            spec[d] = DATA_AXIS
            return P(*spec)
    return base


def _path_names(path) -> tuple:
    names = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is None:
            idx = getattr(k, "idx", None)
            name = f"[{idx}]" if idx is not None else str(k)
        names.append(str(name))
    return tuple(names)


def tp_spec(path, leaf) -> P:
    """PartitionSpec for one state leaf under FFN tensor parallelism.

    Rules apply only inside a ``TransformerBlock`` scope (``block_<i>``):
    CLIP's attention pool also names its output projection ``c_proj``
    (models/m_resnet.py), and that per-sample matvec is not worth a split.
    """
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", None)
    for suffix, want_ndim, spec in _TP_RULES:
        if (names[-len(suffix):] == suffix and ndim == want_ndim
                and len(names) > len(suffix)
                and names[-len(suffix) - 1].startswith("block_")):
            return spec
    return P()


def shard_state(state, mesh: Mesh, optimizer_sharding: bool = False,
                min_zero1_elems: int = MIN_ZERO1_ELEMS):
    """Place train/eval state on ``mesh``: replicated when the model axis
    is 1 (the default), FFN-tensor-parallel per :data:`_TP_RULES` when the
    mesh was built with ``num_model > 1``, and — with
    ``optimizer_sharding`` (``TPU.OPTIMIZER_SHARDING``) — the Adam/SGD
    moment mirrors under ``opt_state`` ZeRO-1-sharded over ``data`` per
    :func:`zero1_spec`.

    The sharded placements alone drive GSPMD: jitted steps consume the
    committed arrays, the partitioner propagates the split through the
    matmuls, and elementwise updates (Adam, EMA) keep the layout, so the
    same step function serves every parallelism mode.
    """
    if mesh.shape[MODEL_AXIS] == 1 and not optimizer_sharding:
        return replicate_state(state, mesh)
    tp_active = mesh.shape[MODEL_AXIS] > 1
    matched = [False]

    def place(path, leaf):
        names = _path_names(path)
        if optimizer_sharding and names and names[0] == "opt_state":
            spec = zero1_spec(path, leaf, mesh, min_zero1_elems)
        else:
            spec = tp_spec(path, leaf)
        if spec != P() and MODEL_AXIS in tuple(spec):
            matched[0] = True
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = jax.tree_util.tree_map_with_path(place, state)
    if tp_active and not matched[0]:
        # A model-parallel mesh whose state matched no rule (e.g. the
        # RN50+bi-GRU flagship has no TransformerBlock FFNs) would silently
        # replicate everything while the batch stays sharded over `data`
        # alone — the model-axis devices would duplicate work for zero
        # speedup.  Refuse loudly instead of degrading.
        raise ValueError(
            f"TPU.MODEL_PARALLEL={mesh.shape[MODEL_AXIS]} but no state "
            "leaf matches a tensor-parallel rule (c_fc/c_proj transformer "
            "FFNs). Tensor parallelism applies to the ViT/full-CLIP "
            "family; use a pure data mesh for this model."
        )
    return out


def local_batch_size(global_batch: int, mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return global_batch
    n = data_shard_count(mesh)
    if global_batch % n != 0:
        raise ValueError(
            f"Global batch {global_batch} not divisible by data-shard "
            f"count {n}"
        )
    return global_batch // n
