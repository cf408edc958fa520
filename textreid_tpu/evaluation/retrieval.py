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


def sharded_topk_retrieval(
    mesh,
    queries: jax.Array,  # [Q, D] L2-normalized
    gallery: jax.Array,  # [G, D] L2-normalized; G % mesh data size == 0
    k: int = 10,
    use_pallas: bool = False,
):
    """Global top-k gallery matches per query over a gallery sharded across
    the mesh.  Returns ([Q, k] scores, [Q, k] int32 global gallery indices).
    """
    n_shards = mesh.shape[DATA_AXIS]
    g_count = gallery.shape[0]
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

    def local_rank(queries, gallery_shard):
        # gallery_shard: [G/n, D] (this chip's rows)
        if use_pallas:
            from ..ops.ranking_pallas import topk_similarity_padded

            vals, idx = topk_similarity_padded(queries, gallery_shard,
                                               k=k_local)
        else:
            vals, idx = _local_topk_xla(queries, gallery_shard, k_local)
        # globalize row ids
        shard_id = jax.lax.axis_index(DATA_AXIS)
        idx = idx + shard_id * shard_rows
        # gather every shard's candidates: [n, Q, k_local] -> [Q, n*k_local]
        all_vals = jax.lax.all_gather(vals, DATA_AXIS)
        all_idx = jax.lax.all_gather(idx, DATA_AXIS)
        q = queries.shape[0]
        all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q, n_shards * k_local)
        all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q, n_shards * k_local)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return top_vals, top_idx

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
