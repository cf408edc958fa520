"""Evaluation engine.

Counterpart of `/root/reference/lib/engine/inference.py`: encode every
(image, caption) pair with the eval path, assemble per-sample embeddings,
and hand them to the ranking evaluator.  Differences by design:

* one jitted fixed-shape encode program per loader (eval batches are padded
  + masked — no ragged final batch, no recompiles);
* multi-device merge is an all-gather of fixed-shape arrays implied by the
  batch sharding, not the reference's pickle-based byte-tensor all_gather
  (`lib/utils/comm.py:47-87`);
* the similarity/CMC/mAP/rerank math runs on-device (evaluation/metrics.py).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import numpy as np

from ..evaluation.metrics import evaluation, format_results_table
from ..parallel.mesh import shard_batch, shard_state
from .state import TrainState
from .steps import encode_step


def compute_embeddings(model, state: TrainState, data_loader, mesh=None):
    """Encode the whole loader; returns per-sample arrays ordered by dataset
    index (reference compute_on_dataset, inference.py:14-26)."""
    if mesh is not None:
        # Batches arrive mesh-sharded; the state must live on the same mesh.
        # Embeddings come back *replicated*: XLA inserts the all-gather over
        # ICI (the native analogue of the reference's pickle byte-tensor
        # all_gather, lib/utils/comm.py:47-87), which also makes the outputs
        # fully addressable from every process — np.asarray below is then
        # correct for jax.process_count() > 1, where the per-device shards
        # of a batch-sharded output would not all be host-local.
        state = shard_state(state, mesh)
        from ..parallel.mesh import replicated

        out_shardings = (replicated(mesh), replicated(mesh))
    else:
        out_shardings = None

    @partial(jax.jit, out_shardings=out_shardings)
    def _encode(state, batch):
        return encode_step(model, state, batch)

    def staged():
        # One batch staged on device ahead of the one being encoded.
        pending = None
        for batch in data_loader:
            valid = batch.pop("valid")
            device_batch = (
                shard_batch(batch, mesh) if mesh is not None
                else {k: jax.device_put(v) for k, v in batch.items()}
            )
            if pending is not None:
                yield pending
            pending = (batch, valid, device_batch)
        if pending is not None:
            yield pending

    v_chunks, t_chunks, idx_chunks = [], [], []
    pid_chunks, img_chunks = [], []
    for batch, valid, device_batch in staged():
        v, t = _encode(state, device_batch)
        v = np.asarray(v)[valid]
        t = np.asarray(t)[valid]
        v_chunks.append(v)
        t_chunks.append(t)
        idx_chunks.append(batch["index"][valid])
        pid_chunks.append(batch["pids"][valid])
        img_chunks.append(batch["image_ids"][valid])

    index = np.concatenate(idx_chunks)
    order = np.argsort(index)
    return {
        "v_embed": np.concatenate(v_chunks)[order],
        "t_embed": np.concatenate(t_chunks)[order],
        "pids": np.concatenate(pid_chunks)[order],
        "image_ids": np.concatenate(img_chunks)[order],
    }


def inference(
    model,
    state: TrainState,
    data_loader,
    dataset_name: str = "cuhkpedes-test",
    output_folder: str = "",
    save_data: bool = True,
    rerank: bool = True,
    topk=(1, 5, 10),
    mesh=None,
) -> float:
    """Full eval protocol (reference inference.py:48-96).  Returns t2i CMC@1.

    When ``output_folder`` holds ``inference_data.npz``, embeddings are not
    recomputed (reference inference.py:64 / evaluation.py:85-95 replay).
    """
    logger = logging.getLogger("PersonSearch.inference")
    cache = os.path.join(output_folder, "inference_data.npz") if output_folder else ""

    if cache and os.path.exists(cache):
        logger.info("Loading cached inference data from %s", cache)
        data = np.load(cache)
        if "similarity" in data and "v_embed" not in data:
            # Reference-format replay (evaluation.py:85-95): the torch code
            # caches {image_pid, text_pid, similarity[, rvn_mat, rtn_mat]}.
            return _evaluate_reference_npz(data, topk, rerank, logger)
        embeds = {k: data[k] for k in
                  ("v_embed", "t_embed", "pids", "image_ids")}
    else:
        n = len(data_loader.dataset)
        logger.info("Start evaluation on %s (%d samples).", dataset_name, n)
        start = time.time()
        embeds = compute_embeddings(model, state, data_loader, mesh)
        total = time.time() - start
        logger.info(
            "Total inference time: %.2fs (%.4f s/sample)", total, total / n
        )
        # Saved after evaluation() below so the cache carries both our
        # embedding format and the reference's similarity-matrix format.

    results = evaluation(
        embeds["v_embed"],
        embeds["t_embed"],
        embeds["pids"],
        embeds["pids"],
        embeds["image_ids"],
        topk=topk,
        rerank=rerank,
    )
    if cache and save_data and not os.path.exists(cache) and (
        jax.process_index() == 0
    ):
        # Dual-format cache: our embeddings (replayable here) plus the
        # reference's {image_pid, text_pid, similarity[, rvn/rtn_mat]}
        # (replayable by the torch code's --load-result,
        # evaluation.py:126-142).
        extra = {
            k: results[k]
            for k in ("image_pid", "text_pid", "similarity", "rvn_mat",
                      "rtn_mat")
            if k in results
        }
        np.savez(cache, **embeds, **extra)
    logger.info("\n%s", format_results_table(results))
    return results["t2i"]["cmc"][0]


def _evaluate_reference_npz(data, topk, rerank, logger) -> float:
    """Score a similarity matrix cached by the reference torch code
    (`lib/data/metrics/evaluation.py:126-142` save format)."""
    import jax.numpy as jnp

    from ..evaluation.metrics import rank

    similarity = jnp.asarray(data["similarity"])
    image_pid = jnp.asarray(data["image_pid"])
    text_pid = jnp.asarray(data["text_pid"])

    def pack(cmc, mean_ap):
        return {"topk": list(topk), "cmc": [float(c) for c in cmc],
                "mAP": float(mean_ap)}

    results = {}
    t2i = rank(similarity, text_pid, image_pid, topk)
    i2t = rank(similarity.T, image_pid, text_pid, topk)
    results["t2i"] = pack(t2i[0], t2i[1])
    results["i2t"] = pack(i2t[0], i2t[1])
    if rerank and "rvn_mat" in data:
        re_t2i = rank(jnp.asarray(data["rvn_mat"]) + similarity,
                      text_pid, image_pid, topk)
        re_i2t = rank(jnp.asarray(data["rtn_mat"]) + similarity.T,
                      image_pid, text_pid, topk)
        results["re_t2i"] = pack(re_t2i[0], re_t2i[1])
        results["re_i2t"] = pack(re_i2t[0], re_i2t[1])
    logger.info("\n%s", format_results_table(results))
    return results["t2i"]["cmc"][0]
