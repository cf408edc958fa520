"""Exact large-batch contrastive training at microbatch activation memory.

The reference can only grow its contrastive batch by adding GPUs
(`/root/reference/lib/engine/trainer.py:72-121` holds one full batch's
activations live through backward).  Naive gradient accumulation does not
work for this model family: ``global_align_loss`` / CMPM couple every pair
of samples in the batch, and the MoCo same-identity queue mask
(`moco_head/head.py:147-157`) is a function of *all* batch ids — summing
per-microbatch losses trains a different (weaker) objective.

This module implements the gradient-cache construction (Gao et al. 2021,
"Scaling Deep Contrastive Learning Batch Size under Memory Limited Setup")
as two ``lax.scan`` passes, which XLA compiles to a compute graph whose
live activation set is ONE microbatch:

1. **Embed pass** — scan the microbatches through the query towers with no
   gradient tape, collecting the final f32 embeddings ([B, D] — a few MB)
   and the BatchNorm stats carry *entering* each microbatch (needed to
   replay the forward exactly in pass 2).
2. **Loss** — the identical batch-level loss tail the single-pass step uses
   (`steps.py:simple_loss_tail` / ``moco_loss_tail``) on the assembled
   embeddings; differentiate it w.r.t. the embeddings (tiny) and the
   projection matrix (used directly by ``instance_loss``).
3. **Backprop pass** — scan the microbatches again; each body re-runs the
   microbatch forward under ``jax.vjp`` from its recorded stats carry (the
   replay is exact: the forward is deterministic given params/stats/batch —
   random erasing is precomputed per-sample on the host and the dropout
   branches are inactive on this path, same as the single-pass step) and
   pulls the cached embedding cotangents back to parameter gradients,
   summed across microbatches into one param-shaped accumulator.

One optimizer update, one MoCo EMA update and one full-batch queue append
then follow, exactly as in the single-pass step.  Total compute is roughly
2 forwards + 1 backward per microbatch vs 1+1 — the same trade
``TPU.REMAT`` makes, with the memory ceiling now set by ``B / M`` instead
of ``B``.  Under a data mesh the microbatch axis is scanned on every chip
while the batch axis stays sharded, so the construction composes with
dp/tp unchanged (tests/test_grad_cache.py exercises the 8-device mesh).

Semantics deltas vs one giant batch, both documented in the config
docstring (``SOLVER.GRAD_ACCUM_STEPS``): BatchNorm towers normalize each
microbatch with its own statistics (running stats advance sequentially,
like a torch user feeding M small batches), and therefore only
LayerNorm-only towers (ViT, CLIP text transformer) compute the identical
batch-level objective — equal to the single-pass step up to
reduction-order float noise (tests/test_grad_cache.py asserts agreement
to 1e-5; the scanned contraction orders differ, so bit equality is not
the claim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import losses
from .state import TrainState
from .steps import (
    MOCO_TEMPERATURE,
    _encode_image_train,
    apply_updates,
    enqueue,
    moco_key_forward,
    moco_loss_tail,
    simple_loss_tail,
)


def _split_micro(batch, n_micro):
    """Reshape every [B, ...] batch leaf to [M, B/M, ...] for lax.scan."""

    def split(x):
        b = x.shape[0]
        if b % n_micro != 0:
            raise ValueError(
                f"SOLVER.GRAD_ACCUM_STEPS={n_micro} must divide the global "
                f"batch size {b}"
            )
        return x.reshape((n_micro, b // n_micro) + x.shape[1:])

    return {k: split(v) for k, v in batch.items()}


def _flatten_micro(x):
    """[M, b, ...] -> [M*b, ...] (inverse of _split_micro per leaf)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def _query_forward(model, params, bs, constants, micro, remat, use_fc):
    """One microbatch through the query towers to final f32 embeddings.

    ``use_fc`` is ``None`` for the simple head (outputs ``(v_embed,
    t_embed)``), else the MoCo ``MODEL.MOCO.FC`` flag (outputs ``(v_embed,
    t_embed, v_q, t_q)`` with the queries L2-normalized) — mirroring the
    forward halves of ``steps.simple_train_step`` / ``moco_train_step``.
    """
    v_feat, new_bs = _encode_image_train(
        model, params, bs, constants, micro["pixels"], micro.get("erase"),
        remat,
    )
    t_feat = model.apply(
        {"params": params, "batch_stats": bs, "constants": constants},
        micro["token_ids"], micro["lengths"], method="encode_text",
    )
    v_embed = model.apply({"params": params}, v_feat, method="embed_image")
    t_embed = model.apply({"params": params}, t_feat, method="embed_text")
    v_embed = v_embed.astype(jnp.float32)
    t_embed = t_embed.astype(jnp.float32)
    if use_fc is None:
        return (v_embed, t_embed), new_bs
    if use_fc:
        v_q = model.apply({"params": params}, v_feat, method="project_image")
        t_q = model.apply({"params": params}, t_feat, method="project_text")
    else:
        v_q, t_q = v_embed, t_embed
    v_q = losses.l2_normalize(v_q.astype(jnp.float32), axis=1)
    t_q = losses.l2_normalize(t_q.astype(jnp.float32), axis=1)
    return (v_embed, t_embed, v_q, t_q), new_bs


def _cached_grads(model, params, batch_stats, constants, micros, remat,
                  use_fc, tail_fn):
    """Passes 1-3: embed scan, batch-level loss, backprop scan.

    ``tail_fn(embeds, projection_f32) -> loss_dict`` receives the
    full-batch embedding tuple.  Returns ``(grads, loss_dict, new_bs)``.
    """

    def pass1_body(bs, micro):
        outs, new_bs = _query_forward(model, params, bs, constants, micro,
                                      remat, use_fc)
        # Emit the stats carry ENTERING this microbatch so pass 2 can
        # replay the identical forward.
        return new_bs, (outs, bs)

    new_bs, (outs_stacked, bs_seq) = jax.lax.scan(
        pass1_body, batch_stats, micros
    )
    embeds = tuple(_flatten_micro(o) for o in outs_stacked)

    def tail(embeds, projection):
        loss_dict = tail_fn(embeds, projection)
        total = sum(loss_dict.values())
        return total, loss_dict

    projection = params["projection"].astype(jnp.float32)
    (_, loss_dict), (embed_grads, proj_grad) = jax.value_and_grad(
        tail, argnums=(0, 1), has_aux=True
    )(embeds, projection)
    cts = tuple(
        g.reshape(outs_stacked[i].shape) for i, g in enumerate(embed_grads)
    )

    def pass2_body(grads_acc, xs):
        micro, bs_in, ct = xs
        _, vjp = jax.vjp(
            lambda p: _query_forward(model, p, bs_in, constants, micro,
                                     remat, use_fc)[0],
            params,
        )
        (g,) = vjp(ct)
        return jax.tree.map(jnp.add, grads_acc, g), None

    zeros = jax.tree.map(jnp.zeros_like, params)
    grads, _ = jax.lax.scan(pass2_body, zeros, (micros, bs_seq, cts))
    grads = {
        **grads,
        "projection": grads["projection"]
        + proj_grad.astype(grads["projection"].dtype),
    }
    return grads, loss_dict, new_bs


def make_grad_cache_step(model, tx, cfg, n_micro):
    """Build the jittable microbatched train step (same signature/semantics
    surface as ``steps.make_train_step``'s single-pass steps)."""
    is_moco = cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco"
    momentum = cfg.MODEL.MOCO.M
    use_fc = bool(cfg.MODEL.MOCO.FC) if is_moco else None
    epsilon = cfg.MODEL.EMBEDDING.EPSILON
    remat = bool(cfg.TPU.REMAT)
    temperature = MOCO_TEMPERATURE

    def simple_step(state: TrainState, batch):
        micros = _split_micro(batch, n_micro)
        labels = batch["pids"]

        def tail_fn(embeds, projection):
            v_embed, t_embed = embeds
            return simple_loss_tail(projection, v_embed, t_embed, labels,
                                    epsilon)

        grads, loss_dict, new_bs = _cached_grads(
            model, state.params, state.batch_stats, state.constants,
            micros, remat, use_fc, tail_fn,
        )
        new_params, new_opt_state = apply_updates(tx, state, grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        metrics = dict(loss_dict)
        metrics["loss"] = sum(loss_dict.values())
        return new_state, metrics

    def moco_step(state: TrainState, batch):
        micros = _split_micro(batch, n_micro)
        ids = batch["pids"].astype(jnp.int32)

        # 1) EMA momentum update with the pre-update query params
        #    (head.py:73-94,132-133) — once per optimizer step.
        key_params = jax.tree.map(
            lambda k, q: k * momentum + q * (1.0 - momentum),
            state.key_params, state.params,
        )

        # 2) key forwards per microbatch (stop-gradient; key BN stats
        #    advance sequentially like the query side).
        def key_body(kbs, micro):
            v_k_i, t_k_i, new_kbs = moco_key_forward(
                model, use_fc, key_params, kbs, state.params,
                state.constants, micro,
            )
            return new_kbs, (v_k_i, t_k_i)

        new_key_bs, (v_k_st, t_k_st) = jax.lax.scan(
            key_body, state.key_batch_stats, micros
        )
        v_k = _flatten_micro(v_k_st)
        t_k = _flatten_micro(t_k_st)

        # 3) gradient-cache query passes with the FULL-batch loss tail
        #    (global ids in the queue mask, all-pairs global_align).
        def tail_fn(embeds, projection):
            v_embed, t_embed, v_q, t_q = embeds
            return moco_loss_tail(
                projection, v_embed, t_embed, v_q, t_q, v_k, t_k, ids,
                state.id_queue, state.v_queue, state.t_queue, epsilon,
                temperature,
            )

        grads, loss_dict, new_bs = _cached_grads(
            model, state.params, state.batch_stats, state.constants,
            micros, remat, use_fc, tail_fn,
        )
        new_params, new_opt_state = apply_updates(tx, state, grads)

        # 4) one full-batch dequeue/enqueue after the loss (head.py:175).
        v_queue, t_queue, id_queue, new_ptr = enqueue(state, v_k, t_k, ids)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            key_params=key_params,
            key_batch_stats=new_key_bs,
            v_queue=v_queue,
            t_queue=t_queue,
            id_queue=id_queue,
            queue_ptr=new_ptr,
        )
        metrics = dict(loss_dict)
        metrics["loss"] = sum(loss_dict.values())
        return new_state, metrics

    return moco_step if is_moco else simple_step
