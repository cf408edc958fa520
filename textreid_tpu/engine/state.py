"""Functional training state.

The reference keeps its mutable training state scattered across torch
module buffers — MoCo key encoders as deep copies with ``requires_grad=False``
(`/root/reference/lib/models/embeddings/moco_head/head.py:23-30`), ring-buffer
queues and pointer as registered buffers (head.py:53-62) — plus the optimizer
and scheduler objects.  Here it is a single immutable pytree threaded through
the jitted train step, which is what makes the step pure, shardable under a
mesh, and checkpointable as one atomic object:

* ``params`` / ``batch_stats`` / ``constants`` — the query model,
* ``opt_state`` — optax state (the per-epoch learning rate lives inside via
  ``inject_hyperparams``),
* ``key_params`` / ``key_batch_stats`` — the EMA key encoders (MoCo only),
* ``v_queue`` / ``t_queue`` as ``[K, D]`` row-major (lane dim = feature,
  128-aligned; the reference stores ``[D, K]``, head.py:53-56),
* ``id_queue`` ``[K]`` init -1 (head.py:57-58), ``queue_ptr`` scalar.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    # MoCo-only fields (None for the simple head).
    key_params: Optional[Any] = None
    key_batch_stats: Optional[Any] = None
    v_queue: Optional[jnp.ndarray] = None
    t_queue: Optional[jnp.ndarray] = None
    id_queue: Optional[jnp.ndarray] = None
    queue_ptr: Optional[jnp.ndarray] = None


def create_train_state(cfg, model, tx, rng, sample_batch,
                       global_batch=None) -> TrainState:
    """Initialize model variables and (for MoCo) key copies + queues.

    ``sample_batch`` supplies shapes only; K %% global batch == 0 is enforced
    like the reference's enqueue assert (head.py:103).  Pass ``global_batch``
    explicitly when ``sample_batch`` is a per-process shard (multi-host
    process-sharded loading) — its leading dim is then local, not global.
    """
    # jitted init: unjitted flax init dispatches op-by-op on the device,
    # which is pathologically slow on remote/relay TPU backends.
    variables = jax.jit(
        lambda: model.init(
            rng,
            jnp.asarray(sample_batch["pixels"]),
            jnp.asarray(sample_batch["token_ids"]),
            jnp.asarray(sample_batch["lengths"]),
            method="init_all",
        )
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    constants = variables.get("constants", {})
    opt_state = tx.init(params)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        constants=constants,
        opt_state=opt_state,
    )

    if cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco":
        k = cfg.MODEL.MOCO.K
        d = cfg.MODEL.EMBEDDING.FEATURE_SIZE
        batch = global_batch or sample_batch["pixels"].shape[0]
        if k % batch != 0:
            raise ValueError(
                f"MoCo queue size K={k} must be divisible by the global batch "
                f"size {batch} (reference head.py:103)"
            )
        qkey_v, qkey_t = jax.random.split(jax.random.fold_in(rng, 1))
        # Reference inits queues with L2-normalized uniform noise
        # (torch.rand then F.normalize, head.py:53-56).
        v_queue = jax.random.uniform(qkey_v, (k, d))
        t_queue = jax.random.uniform(qkey_t, (k, d))
        v_queue = v_queue / jnp.linalg.norm(v_queue, axis=1, keepdims=True)
        t_queue = t_queue / jnp.linalg.norm(t_queue, axis=1, keepdims=True)
        state = state.replace(
            key_params=jax.tree.map(jnp.copy, params),
            key_batch_stats=jax.tree.map(jnp.copy, batch_stats),
            v_queue=v_queue,
            t_queue=t_queue,
            id_queue=-jnp.ones((k,), jnp.int32),
            queue_ptr=jnp.zeros((), jnp.int32),
        )
    return state
