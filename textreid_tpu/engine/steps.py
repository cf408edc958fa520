"""Jitted train/eval steps for the simple and MoCo embedding heads.

Re-expression of the reference per-iteration body
(`/root/reference/lib/engine/trainer.py:72-121`,
`lib/models/embeddings/moco_head/head.py:111-176`,
`lib/models/embeddings/simple_head/head.py:33-47`) as pure functions of
``(TrainState, batch) -> (TrainState, metrics)``:

MoCo step ordering matches the reference exactly — EMA momentum update
*before* the key forward (head.py:132-134), key embeddings from the updated
key encoders under ``stop_gradient`` (head.py:134-145), dequeue/enqueue
*after* the losses (head.py:175).  The same-identity negative exclusion
(head.py:147-157, a dynamic gather in torch) becomes a static-shape ``-inf``
mask on the negative logits; with the InfoNCE target at index 0 this is
mathematically identical (verified in tests/test_losses.py).

Everything here takes the *global* batch: under a data mesh, batch inputs
are sharded on axis 0 and the state is replicated; XLA inserts the psum /
all-gather collectives (including the global-batch queue append, the
behavior the reference's per-rank queues got wrong — SURVEY.md section 2
parallelism table).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import losses
from .state import TrainState

# InfoNCE temperature (moco_head/loss.py:18) — shared with grad_cache.py so
# the microbatched step can never drift to a different objective.
MOCO_TEMPERATURE = 0.07


def apply_updates(tx, state: TrainState, grads):
    """One optimizer step: ``(new_params, new_opt_state)`` (shared by the
    single-pass and grad-cache steps)."""
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return new_params, new_opt_state


def enqueue(state: TrainState, v_k, t_k, ids):
    """Full-batch dequeue/enqueue after the loss (head.py:96-109,175):
    ``(v_queue, t_queue, id_queue, new_ptr)``."""
    ptr = state.queue_ptr
    v_queue = jax.lax.dynamic_update_slice_in_dim(
        state.v_queue, v_k, ptr, axis=0
    )
    t_queue = jax.lax.dynamic_update_slice_in_dim(
        state.t_queue, t_k, ptr, axis=0
    )
    id_queue = jax.lax.dynamic_update_slice_in_dim(
        state.id_queue, ids, ptr, axis=0
    )
    new_ptr = (ptr + ids.shape[0]) % state.id_queue.shape[0]
    return v_queue, t_queue, id_queue, new_ptr


def _encode_image_train(model, params, batch_stats, constants, pixels,
                        erase, remat=False):
    """Query image-tower forward in train mode, optionally rematerialized
    (``TPU.REMAT``): jax.checkpoint drops the tower's activations after the
    forward and recomputes them in the backward — ~1 extra forward for a
    large HBM saving at big batches."""

    def f(params, pixels):
        return _apply(model, params, batch_stats, constants, "encode_image",
                      pixels, train=True, erase=erase)

    if remat:
        f = jax.checkpoint(f)
    return f(params, pixels)


def _apply(model, params, batch_stats, constants, method, *args, train=False,
           **kwargs):
    variables = {"params": params, "batch_stats": batch_stats,
                 "constants": constants}
    if train:
        out, updates = model.apply(
            variables, *args, method=method, train=True,
            mutable=["batch_stats"], **kwargs
        )
        return out, updates["batch_stats"]
    return model.apply(variables, *args, method=method, **kwargs)


def simple_loss_tail(projection, v_embed, t_embed, labels, epsilon):
    """Simple-head losses on final f32 embeddings (simple_head/head.py:33-47).

    Factored out of :func:`simple_train_step` so the grad-cache step
    (grad_cache.py) computes the *identical* batch-level objective on
    embeddings assembled from microbatches."""
    return {
        "instance_loss": losses.instance_loss(
            projection, v_embed, t_embed, labels, epsilon=epsilon
        ),
        "global_align_loss": losses.global_align_loss(
            v_embed, t_embed, labels
        ),
    }


def moco_loss_tail(projection, v_embed, t_embed, v_q, t_q, v_k, t_k, ids,
                   id_queue, v_queue, t_queue, epsilon, temperature):
    """MoCo-head losses on final f32 embeddings (moco_head/head.py:147-174).

    The same-identity exclusion masks a queue slot iff its id matches *any*
    id in the (global) batch — factored here so both the big-batch step and
    the grad-cache step apply it over the full batch's ids."""
    queue_is_pos = jnp.any(id_queue[None, :] == ids[:, None], axis=0)  # [K]
    neg_mask = jnp.where(queue_is_pos, -jnp.inf, 0.0)[None, :]  # [1, K]

    v_pos = jnp.sum(v_q * t_k, axis=1, keepdims=True)  # [N,1]
    v_neg = v_q @ t_queue.T + neg_mask  # [N,K]
    t_pos = jnp.sum(t_q * v_k, axis=1, keepdims=True)
    t_neg = t_q @ v_queue.T + neg_mask

    return {
        "instance_loss": losses.instance_loss(
            projection, v_embed, t_embed, ids, epsilon=epsilon
        ),
        "infonce_loss": losses.infonce_loss(
            v_pos, v_neg, t_pos, t_neg, temperature
        ),
        "global_align_loss": losses.global_align_loss(
            v_embed, t_embed, ids
        ),
    }


def moco_key_forward(model, use_fc, key_params, key_bs, params, constants,
                     batch):
    """Momentum-encoder embeddings (head.py:134-145), all grads stopped.

    Key BN runs in batch-stats mode like torch modules in .train(); its
    running stats update but are never consumed (the eval path uses the
    query encoders only)."""
    v_feat_k, new_key_bs = _apply(
        model, key_params, key_bs, constants, "encode_image",
        batch["pixels"], train=True, erase=batch.get("erase"),
    )
    t_feat_k = model.apply(
        {"params": key_params, "batch_stats": key_bs, "constants": constants},
        batch["token_ids"], batch["lengths"], method="encode_text",
    )
    if use_fc:
        v_k = model.apply({"params": key_params}, v_feat_k,
                          method="project_image")
        t_k = model.apply({"params": key_params}, t_feat_k,
                          method="project_text")
    else:
        # FC=False keys go through the *query* embed layers under
        # no_grad (head.py:139,144) — no momentum copy of the embed layer.
        v_k = model.apply({"params": params}, v_feat_k, method="embed_image")
        t_k = model.apply({"params": params}, t_feat_k, method="embed_text")
    # losses/queue run in f32 regardless of tower compute dtype
    v_k = losses.l2_normalize(v_k.astype(jnp.float32), axis=1)
    t_k = losses.l2_normalize(t_k.astype(jnp.float32), axis=1)
    return (
        jax.lax.stop_gradient(v_k),
        jax.lax.stop_gradient(t_k),
        new_key_bs,
    )


def encode_step(model, state: TrainState, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-path embeddings (reference moco_head/head.py:178-183 /
    model.py:29-41): backbone features through the plain embed layers."""
    v_embed, t_embed = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats,
         "constants": state.constants},
        batch["pixels"], batch["token_ids"], batch["lengths"],
    )
    return v_embed, t_embed


# ---------------------------------------------------------------------------
# Simple head
# ---------------------------------------------------------------------------

def simple_train_step(model, tx, epsilon: float, remat: bool = False):
    """Build the jittable train step for the simple embedding head
    (simple_head/head.py:33-47 + loss.py:22-45)."""

    def loss_fn(params, state, batch):
        v_feat, new_bs = _encode_image_train(
            model, params, state.batch_stats, state.constants,
            batch["pixels"], batch.get("erase"), remat,
        )
        t_feat = model.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "constants": state.constants},
            batch["token_ids"], batch["lengths"], method="encode_text",
        )
        v_embed = model.apply({"params": params}, v_feat, method="embed_image")
        t_embed = model.apply({"params": params}, t_feat, method="embed_text")
        v_embed = v_embed.astype(jnp.float32)
        t_embed = t_embed.astype(jnp.float32)
        labels = batch["pids"]
        projection = params["projection"].astype(jnp.float32)
        loss_dict = simple_loss_tail(projection, v_embed, t_embed, labels,
                                     epsilon)
        total = sum(loss_dict.values())
        return total, (loss_dict, new_bs)

    def step(state: TrainState, batch):
        grads, (loss_dict, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state, batch
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

    return step


# ---------------------------------------------------------------------------
# MoCo head
# ---------------------------------------------------------------------------

def moco_train_step(model, tx, cfg):
    """Build the jittable MoCo train step (moco_head/head.py:111-176)."""
    momentum = cfg.MODEL.MOCO.M
    use_fc = cfg.MODEL.MOCO.FC
    epsilon = cfg.MODEL.EMBEDDING.EPSILON
    remat = bool(cfg.TPU.REMAT)
    temperature = MOCO_TEMPERATURE

    def loss_fn(params, state, batch, v_k, t_k):
        v_feat, new_bs = _encode_image_train(
            model, params, state.batch_stats, state.constants,
            batch["pixels"], batch.get("erase"), remat,
        )
        t_feat = model.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "constants": state.constants},
            batch["token_ids"], batch["lengths"], method="encode_text",
        )
        v_embed = model.apply({"params": params}, v_feat, method="embed_image")
        t_embed = model.apply({"params": params}, t_feat, method="embed_text")
        v_embed = v_embed.astype(jnp.float32)
        t_embed = t_embed.astype(jnp.float32)
        if use_fc:
            v_q = model.apply({"params": params}, v_feat, method="project_image")
            t_q = model.apply({"params": params}, t_feat, method="project_text")
        else:
            v_q, t_q = v_embed, t_embed
        v_q = losses.l2_normalize(v_q.astype(jnp.float32), axis=1)
        t_q = losses.l2_normalize(t_q.astype(jnp.float32), axis=1)

        ids = batch["pids"].astype(jnp.int32)
        loss_dict = moco_loss_tail(
            params["projection"].astype(jnp.float32), v_embed, t_embed,
            v_q, t_q, v_k, t_k, ids, state.id_queue, state.v_queue,
            state.t_queue, epsilon, temperature,
        )
        total = sum(loss_dict.values())
        return total, (loss_dict, new_bs)

    def step(state: TrainState, batch):
        # 1) EMA momentum update of the key encoders with the *pre-update*
        #    query params (head.py:73-94,132-133).
        key_params = jax.tree.map(
            lambda k, q: k * momentum + q * (1.0 - momentum),
            state.key_params, state.params,
        )
        # 2) key forward with the updated key encoders.
        v_k, t_k, new_key_bs = moco_key_forward(
            model, use_fc, key_params, state.key_batch_stats, state.params,
            state.constants, batch,
        )
        # 3) query forward/backward.
        grads, (loss_dict, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state, batch, v_k, t_k
        )
        new_params, new_opt_state = apply_updates(tx, state, grads)

        # 4) dequeue/enqueue after the loss (head.py:96-109,175).
        v_queue, t_queue, id_queue, new_ptr = enqueue(
            state, v_k, t_k, batch["pids"].astype(jnp.int32)
        )

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

    return step


def make_train_step(model, tx, cfg):
    n_micro = int(cfg.SOLVER.GRAD_ACCUM_STEPS)
    if n_micro > 1:
        from .grad_cache import make_grad_cache_step
        return make_grad_cache_step(model, tx, cfg, n_micro)
    if cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco":
        return moco_train_step(model, tx, cfg)
    return simple_train_step(model, tx, cfg.MODEL.EMBEDDING.EPSILON,
                             bool(cfg.TPU.REMAT))
