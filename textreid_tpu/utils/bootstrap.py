"""Shared eval-time bootstrap: config -> (model, state, loaders).

The tools (`tools/parity_eval.py`, `tools/build_index.py`) and ad-hoc
scripts all need the same sequence — build the eval loaders, initialize the
model/optimizer/TrainState from one sample batch, then load a checkpoint
(orbax directory or reference torch ``.pth``, converted on the fly,
mirroring `test_net.py`'s branch at /root/reference/test_net.py:76-83
semantics).  One implementation here so they cannot drift.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def build_eval_state(
    cfg,
    checkpoint_file: str = "",
    dtype=None,
    use_pallas: Optional[bool] = None,
    need_loaders: bool = True,
) -> Tuple[object, object, list]:
    """Returns ``(model, state, eval_loaders)`` for a frozen config.

    ``dtype`` defaults to f32 (parity work wants exactness); pass
    ``utils.platform.compute_dtype(cfg)`` for production bf16.
    ``checkpoint_file`` may be an orbax directory or a torch ``.pth``.

    ``need_loaders=False`` skips the dataset entirely (``loaders`` comes
    back empty) and initializes parameter shapes from the config's input
    dims — a serving replica boots from checkpoint + persisted index
    alone, with no annotations on disk (the point of
    ``RetrievalIndex.save_index``).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..config import get_default_cfg  # noqa: F401  (documented entry)
    from ..engine import create_train_state
    from ..models import build_model
    from ..solver import make_optimizer
    from .checkpoint import Checkpointer
    from .vocab import frozen_table_initializer
    from .weight_convert import (
        convert_textreid_checkpoint,
        load_torch_state_dict,
        merge_pretrained,
    )

    from .platform import setup_compilation_cache

    setup_compilation_cache(cfg)

    if use_pallas is None:
        use_pallas = (bool(cfg.TPU.GRU_PALLAS)
                      and jax.default_backend() == "tpu")

    if need_loaders:
        from ..data import make_data_loader

        loaders = make_data_loader(cfg, is_train=False)
        sample = dict(next(iter(loaders[0])))
        sample.pop("valid", None)
    else:
        loaders = []
        # shapes only (create_train_state contract); batch 1 divides any
        # MoCo queue size
        sample = {
            "pixels": np.zeros(
                (1, cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH, 3), np.float32),
            "token_ids": np.zeros(
                (1, cfg.INPUT.MAX_TEXT_LENGTH), np.int32),
            "lengths": np.ones((1,), np.int32),
            "pids": np.zeros((1,), np.int32),
        }

    model = build_model(cfg, frozen_table_initializer(cfg),
                        dtype=dtype or jnp.float32, use_pallas=use_pallas)
    tx = make_optimizer(cfg, jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["pixels"]),
        jnp.asarray(sample["token_ids"]), jnp.asarray(sample["lengths"]),
        method="init_all"))()["params"])
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), sample)

    if checkpoint_file:
        if os.path.isdir(checkpoint_file):
            state = Checkpointer().load(checkpoint_file, state)
        else:
            sd = load_torch_state_dict(checkpoint_file)
            state = install_torch_checkpoint(
                state, convert_textreid_checkpoint(sd, cfg))
    return model, state, loaders


def install_torch_checkpoint(state, converted: dict):
    """Install an imported reference checkpoint
    (:func:`weight_convert.convert_textreid_checkpoint` output) into a
    TrainState: query params/batch_stats plus — when both the state and the
    checkpoint carry them — the MoCo key encoders, queues, and pointer
    (reference moco_head/head.py:53-62).  Dropping the MoCo pieces would
    leave random init in the state — wrong for resume and silently
    corrupting for re-export (tools/export_torch.py)."""
    import jax.numpy as jnp

    from .weight_convert import merge_pretrained

    merged = merge_pretrained(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
    )
    state = state.replace(params=merged["params"],
                          batch_stats=merged["batch_stats"])
    if state.key_params is not None and "key_params" in converted:
        merged_k = merge_pretrained(
            {"params": state.key_params,
             "batch_stats": state.key_batch_stats},
            {"params": converted["key_params"],
             "batch_stats": converted["key_batch_stats"]},
        )
        # queue buffers get the same shape gate merge_pretrained applies
        # to params: a checkpoint trained with a different MOCO.K or
        # FEATURE_SIZE must fail HERE with the buffer named, not as a
        # cryptic XLA error (or silent pointer wraparound) inside the
        # first jitted step.
        for buf in ("v_queue", "t_queue", "id_queue"):
            want = tuple(getattr(state, buf).shape)
            got = tuple(jnp.asarray(converted[buf]).shape)
            if want != got:
                raise ValueError(
                    f"MoCo buffer shape mismatch at {buf}: checkpoint "
                    f"{got} vs model {want} — the checkpoint's MOCO.K/"
                    f"FEATURE_SIZE does not match the configured model")
        state = state.replace(
            key_params=merged_k["params"],
            key_batch_stats=merged_k["batch_stats"],
            v_queue=jnp.asarray(converted["v_queue"], state.v_queue.dtype),
            t_queue=jnp.asarray(converted["t_queue"], state.t_queue.dtype),
            id_queue=jnp.asarray(converted["id_queue"],
                                 state.id_queue.dtype),
            queue_ptr=jnp.asarray(converted["queue_ptr"],
                                  state.queue_ptr.dtype),
        )
    return state
