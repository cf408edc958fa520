"""Retrieval metrics: CMC@k, mAP, and k-reciprocal re-ranking.

TPU-native counterpart of the reference evaluator
(`/root/reference/lib/data/metrics/evaluation.py`):

* ``rank`` — CMC@topk + mAP from a similarity matrix (evaluation.py:11-37).
* ``k_reciprocal`` — the reference computes a Jaccard overlap between the
  top-``n`` neighbor lists of every (query, gallery) pair with a pure-Python
  double loop flagged ``FIXME: need optimization`` (evaluation.py:40-65).
  Since both neighbor lists are index *sets* of fixed size ``n``, the
  intersection counts for all pairs at once are a single MXU matmul of
  one-hot neighbor indicators: ``I = A @ B.T``; Jaccard = ``I/(2n - I)``.
* ``evaluation`` — gallery dedupe by image id (first occurrence wins,
  evaluation.py:68-73,113-115), L2-normalize, ``similarity = text @ image.T``,
  and the t2i/i2t +/- rerank metric grid (evaluation.py:144-173).

Everything except the final table assembly is jittable and shape-static.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.losses import l2_normalize

Array = jax.Array


def rank(
    similarity: Array,
    q_pids: Array,
    g_pids: Array,
    topk: Sequence[int] = (1, 5, 10),
    get_map: bool = True,
):
    """CMC@topk (percent) and mAP from a [Q, G] similarity matrix.

    Follows reference evaluation.py:11-37: full argsort when mAP is needed,
    a top-k shortcut otherwise.
    """
    topk = tuple(int(k) for k in topk)
    max_rank = max(topk)
    if get_map:
        indices = jnp.argsort(-similarity, axis=1)
    else:
        _, indices = jax.lax.top_k(similarity, max_rank)

    pred_labels = g_pids[indices]  # [Q, G or max_rank]
    matches = (pred_labels == q_pids[:, None]).astype(jnp.float32)

    cmc_curve = jnp.cumsum(matches[:, :max_rank], axis=1)
    cmc_curve = jnp.minimum(cmc_curve, 1.0)
    all_cmc = jnp.mean(cmc_curve, axis=0) * 100.0
    cmc_at = all_cmc[jnp.asarray(topk) - 1]

    if not get_map:
        return cmc_at, indices

    num_rel = jnp.sum(matches, axis=1)
    ranks = jnp.arange(1, matches.shape[1] + 1, dtype=jnp.float32)
    precision_at = jnp.cumsum(matches, axis=1) / ranks[None, :]
    # A query with zero relevant gallery items scores AP=0 here.  The
    # reference divides by num_rel unguarded (evaluation.py:33-36) and
    # would produce NaN; real CUHK-PEDES queries always have >=1 match so
    # the two agree there, but ICFG/synthetic splits may not.
    ap = jnp.where(
        num_rel > 0,
        jnp.sum(precision_at * matches, axis=1) / jnp.maximum(num_rel, 1.0),
        0.0,
    )
    mean_ap = jnp.mean(ap) * 100.0
    return cmc_at, mean_ap, indices


def _topk_onehot(sim: Array, k: int) -> Array:
    """[N, M] similarity -> [N, M] float indicator of each row's top-k
    columns (k clamped to M, matching torch's tolerant argsort slicing)."""
    k = min(k, sim.shape[1])
    _, idx = jax.lax.top_k(sim, k)  # [N, k]
    return jnp.zeros_like(sim).at[jnp.arange(sim.shape[0])[:, None], idx].set(1.0)


def k_reciprocal(
    q_feats: Array,
    g_feats: Array,
    neighbor_num: int = 5,
    alpha: float = 0.05,
) -> Array:
    """Jaccard-of-neighbor-lists rerank term (reference evaluation.py:53-65).

    Returns ``alpha * J`` where ``J[i, j]`` is the Jaccard similarity between
    the top-n gallery neighbors of query ``i`` (by q->g similarity) and of
    gallery item ``j`` (by g->g similarity).  Computed for all pairs with one
    matmul over one-hot neighbor indicators.
    """
    qg_sim = q_feats @ g_feats.T  # [Q, G]
    gg_sim = g_feats @ g_feats.T  # [G, G]

    # Neighbor lists are sets of exactly min(n, G) distinct indices.
    n_eff = min(neighbor_num, g_feats.shape[0])
    a = _topk_onehot(qg_sim, n_eff)  # [Q, G]
    b = _topk_onehot(gg_sim, n_eff)  # [G, G]

    intersection = a @ b.T  # [Q, G]
    union = 2.0 * n_eff - intersection
    return alpha * intersection / union


def get_unique_indices(image_ids: np.ndarray) -> np.ndarray:
    """First occurrence of each image id, preserving order
    (reference evaluation.py:68-73)."""
    _, first = np.unique(np.asarray(image_ids), return_index=True)
    return np.sort(first)


@jax.jit
def _compute_similarity(text_feats, image_feats):
    text_feats = l2_normalize(text_feats, axis=-1)
    image_feats = l2_normalize(image_feats, axis=-1)
    return text_feats @ image_feats.T, text_feats, image_feats


def evaluation(
    image_embeds,
    text_embeds,
    image_pids,
    text_pids,
    image_ids,
    topk: Sequence[int] = (1, 5, 10),
    rerank: bool = True,
):
    """Full evaluation protocol (reference evaluation.py:76-173).

    Args:
      image_embeds: [N, D] raw gallery embeddings (pre-dedupe; one per sample).
      text_embeds:  [N, D] query embeddings.
      image_pids / text_pids: [N] person ids.
      image_ids: [N] image ids used to dedupe the gallery.

    Returns a dict with CMC/mAP for t2i and i2t, with re-ranked variants
    when ``rerank``; ``results["t2i"]["cmc"][0]`` is the headline Rank-1.
    """
    keep = get_unique_indices(np.asarray(image_ids))
    image_embeds = jnp.asarray(image_embeds)[keep]
    image_pids_kept = jnp.asarray(image_pids)[keep]
    text_embeds = jnp.asarray(text_embeds)
    text_pids = jnp.asarray(text_pids)

    similarity, text_n, image_n = _compute_similarity(text_embeds, image_embeds)

    results = {}

    def pack(cmc, mean_ap):
        return {
            "topk": list(topk),
            "cmc": [float(c) for c in cmc],
            "mAP": float(mean_ap),
        }

    t2i_cmc, t2i_map, _ = rank(similarity, text_pids, image_pids_kept, topk)
    i2t_cmc, i2t_map, _ = rank(similarity.T, image_pids_kept, text_pids, topk)
    results["t2i"] = pack(t2i_cmc, t2i_map)
    results["i2t"] = pack(i2t_cmc, i2t_map)

    if rerank:
        # Reference naming (evaluation.py:122-124): rtn_mat reranks i2t,
        # rvn_mat reranks t2i.
        rtn = k_reciprocal(image_n, text_n)
        rvn = k_reciprocal(text_n, image_n)
        re_t2i_cmc, re_t2i_map, _ = rank(
            rvn + similarity, text_pids, image_pids_kept, topk
        )
        re_i2t_cmc, re_i2t_map, _ = rank(
            rtn + similarity.T, image_pids_kept, text_pids, topk
        )
        results["re_t2i"] = pack(re_t2i_cmc, re_t2i_map)
        results["re_i2t"] = pack(re_i2t_cmc, re_i2t_map)

    results["similarity"] = np.asarray(similarity)
    # Deduped-gallery pids, exported so callers can write reference-format
    # replay files (evaluation.py:126-142 keys).
    results["image_pid"] = np.asarray(image_pids_kept)
    results["text_pid"] = np.asarray(text_pids)
    if rerank:
        results["rvn_mat"] = np.asarray(rvn)
        results["rtn_mat"] = np.asarray(rtn)
    return results


def format_results_table(results: dict) -> str:
    """Render the t2i/i2t metric grid like reference evaluation.py:164-172."""
    cols = ["t2i", "re_t2i", "i2t", "re_i2t"]
    present = [c for c in cols if c in results]
    lines = ["topk  " + "  ".join(f"{c:>8}" for c in present)]
    for row, k in enumerate(results["t2i"]["topk"]):
        vals = "  ".join(f"{results[c]['cmc'][row]:8.2f}" for c in present)
        lines.append(f"{k:<5} {vals}")
    vals = "  ".join(f"{results[c]['mAP']:8.2f}" for c in present)
    lines.append(f"{'mAP':<5} {vals}")
    return "\n".join(lines)
