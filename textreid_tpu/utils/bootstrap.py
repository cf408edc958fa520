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
) -> Tuple[object, object, list]:
    """Returns ``(model, state, eval_loaders)`` for a frozen config.

    ``dtype`` defaults to f32 (parity work wants exactness); pass
    ``utils.platform.compute_dtype(cfg)`` for production bf16.
    ``checkpoint_file`` may be an orbax directory or a torch ``.pth``.
    """
    import jax.numpy as jnp

    from ..config import get_default_cfg  # noqa: F401  (documented entry)
    from ..data import make_data_loader
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

    if use_pallas is None:
        use_pallas = (bool(cfg.TPU.GRU_PALLAS)
                      and jax.default_backend() == "tpu")

    loaders = make_data_loader(cfg, is_train=False)
    sample = dict(next(iter(loaders[0])))
    sample.pop("valid", None)

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
            converted = convert_textreid_checkpoint(sd, cfg)
            merged = merge_pretrained(
                {"params": state.params, "batch_stats": state.batch_stats},
                {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]},
            )
            state = state.replace(params=merged["params"],
                                  batch_stats=merged["batch_stats"])
    return model, state, loaders
