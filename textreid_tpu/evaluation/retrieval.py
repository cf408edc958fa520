"""Sharded large-gallery retrieval.

The reference evaluates on a single device against a 3k-image gallery
(`/root/reference/lib/data/metrics/evaluation.py:117-124`).  Production
person-search galleries are orders of magnitude larger; this module scales
retrieval across a pod slice:

* the (deduped, L2-normalized) gallery is sharded row-wise over the mesh's
  ``data`` axis — each chip holds G/n rows in HBM;
* queries are replicated; each chip ranks its local shard — with the
  streaming Pallas top-k (`ops/ranking_pallas.py`) on TPU, so the local
  QxG/n similarity block is never materialized either;
* per-shard winners ([Q, k] values + *global* row ids) are all-gathered
  over ICI (k*n candidates per query — tiny) and reduced to the global
  top-k.

Total HBM per chip: O(G/n * D); interconnect: O(Q * k * n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..parallel.mesh import DATA_AXIS


def _local_topk_xla(queries, gallery_shard, k):
    scores = queries @ gallery_shard.T
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


def _plan_shards(n_shards: int, g_count: int, k: int):
    """Validate divisibility and size the per-shard candidate count."""
    if g_count % n_shards != 0:
        raise ValueError(
            f"gallery rows {g_count} must divide over {n_shards} shards "
            f"(pad the gallery with zero rows and mask downstream)"
        )
    shard_rows = g_count // n_shards
    # Each shard only needs min(k, rows) local candidates; the global merge
    # pools n * k_local of them (must still cover k).
    k_local = min(k, shard_rows)
    if n_shards * k_local < k:
        raise ValueError(
            f"top-{k} infeasible: {n_shards} shards x {k_local} local "
            f"candidates"
        )
    return shard_rows, k_local


def _global_merge(vals, idx, n_shards, shard_rows, k, q):
    """Globalize local row ids and reduce all shards' candidates to the
    global top-k (runs inside shard_map)."""
    shard_id = jax.lax.axis_index(DATA_AXIS)
    idx = idx + shard_id * shard_rows
    # gather every shard's candidates: [n, Q, k_local] -> [Q, n*k_local]
    all_vals = jax.lax.all_gather(vals, DATA_AXIS)
    all_idx = jax.lax.all_gather(idx, DATA_AXIS)
    k_local = vals.shape[1]
    all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q, n_shards * k_local)
    all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q, n_shards * k_local)
    top_vals, pos = jax.lax.top_k(all_vals, k)
    top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return top_vals, top_idx


def sharded_topk_retrieval(
    mesh,
    queries: jax.Array,  # [Q, D] L2-normalized
    gallery: jax.Array,  # [G, D] L2-normalized; G % mesh data size == 0
    k: int = 10,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Global top-k gallery matches per query over a gallery sharded across
    the mesh.  Returns ([Q, k] scores, [Q, k] int32 global gallery indices).
    """
    n_shards = mesh.shape[DATA_AXIS]
    shard_rows, k_local = _plan_shards(n_shards, gallery.shape[0], k)

    def local_rank(queries, gallery_shard):
        # gallery_shard: [G/n, D] (this chip's rows)
        if use_pallas:
            from ..ops.ranking_pallas import topk_similarity_padded

            vals, idx = topk_similarity_padded(queries, gallery_shard,
                                               k=k_local, interpret=interpret)
        else:
            vals, idx = _local_topk_xla(queries, gallery_shard, k_local)
        return _global_merge(vals, idx, n_shards, shard_rows, k,
                             queries.shape[0])

    fn = shard_map(
        local_rank,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    queries = jax.device_put(queries, NamedSharding(mesh, P()))
    gallery = jax.device_put(gallery, NamedSharding(mesh, P(DATA_AXIS)))
    return jax.jit(fn)(queries, gallery)


def sharded_topk_retrieval_quantized(
    mesh,
    queries: jax.Array,  # [Q, D] L2-normalized float
    gallery,             # ops.quant.QuantizedGallery; G % mesh data size == 0
    k: int = 10,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """int8 composition of :func:`sharded_topk_retrieval`: each chip holds
    its shard of the int8 gallery + per-row scales (4x the row capacity of
    the float shard) and ranks it with the quantized scoring path —
    the streaming int8 Pallas kernel on TPU, the materializing
    ``ops.quant.quantized_scores`` contraction elsewhere.  Scores match the
    single-device ``ops.quant.quantized_topk`` bit for bit (same bf16 x
    int8 contraction with f32 accumulation, same per-row scale fold), so
    the shard/merge composition is index-exact vs the unsharded quantized
    path.  Returns ([Q, k] scores, [Q, k] int32 global gallery indices).
    """
    from ..ops.quant import QuantizedGallery

    n_shards = mesh.shape[DATA_AXIS]
    shard_rows, k_local = _plan_shards(n_shards, gallery.values.shape[0], k)

    def local_rank(queries, g_vals, g_scales):
        # g_vals: [G/n, D] int8, g_scales: [G/n] f32 (this chip's rows)
        if use_pallas:
            from ..ops.ranking_pallas import (
                topk_similarity_quantized_padded,
            )

            vals, idx = topk_similarity_quantized_padded(
                queries, QuantizedGallery(g_vals, g_scales), k=k_local,
                interpret=interpret,
            )
        else:
            from ..ops.quant import quantized_topk

            vals, idx = quantized_topk(
                queries, QuantizedGallery(g_vals, g_scales), k_local
            )
        return _global_merge(vals, idx, n_shards, shard_rows, k,
                             queries.shape[0])

    fn = shard_map(
        local_rank,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    queries = jax.device_put(queries, NamedSharding(mesh, P()))
    g_vals = jax.device_put(gallery.values,
                            NamedSharding(mesh, P(DATA_AXIS)))
    g_scales = jax.device_put(gallery.scales,
                              NamedSharding(mesh, P(DATA_AXIS)))
    return jax.jit(fn)(queries, g_vals, g_scales)
