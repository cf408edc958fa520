"""Optimizer and LR schedule construction with optax.

Reproduces the reference solver semantics exactly:

* Per-parameter groups (`/root/reference/lib/solver/build.py:6-17`): any
  parameter whose name contains "bias" trains at ``BASE_LR *
  BIAS_LR_FACTOR`` with ``WEIGHT_DECAY_BIAS``; everything else at
  ``BASE_LR`` with ``WEIGHT_DECAY``.  Torch Adam's ``weight_decay`` is L2
  added to the gradient *before* the moment updates, so the optax chain
  places ``add_decayed_weights`` ahead of ``scale_by_adam``.
* The warmup + {step, exp, poly, cosine, linear} epoch schedule
  (`/root/reference/lib/solver/lr_scheduler.py:48-87`), stepped once per
  epoch (`lib/engine/trainer.py:121`).  ``make_lr_schedule`` returns a
  function of the 0-based epoch index — matching torch semantics where
  epoch ``e`` (1-based) trains at ``get_lr(last_epoch=e-1)``.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(cfg) -> Callable[[int], float]:
    """Return lr(epoch_idx) for 0-based epoch_idx, on the host (plain floats)."""
    base_lr = cfg.SOLVER.BASE_LR
    milestones = sorted(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    mode = cfg.SOLVER.LRSCHEDULER
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_epochs = cfg.SOLVER.WARMUP_EPOCHS
    warmup_method = cfg.SOLVER.WARMUP_METHOD
    total_epochs = cfg.SOLVER.NUM_EPOCHS
    target_lr = cfg.SOLVER.TARGET_LR
    power = cfg.SOLVER.POWER

    if mode not in ("step", "exp", "poly", "cosine", "linear"):
        raise ValueError(f"Unknown LR scheduler mode: {mode}")
    if warmup_method not in ("constant", "linear"):
        raise ValueError(f"Unknown warmup method: {warmup_method}")

    def schedule(epoch: int) -> float:
        if epoch < warmup_epochs:
            if warmup_method == "constant":
                factor = warmup_factor
            else:
                alpha = epoch / warmup_epochs
                factor = warmup_factor * (1 - alpha) + alpha
            return base_lr * factor

        if mode == "step":
            return base_lr * gamma ** bisect_right(milestones, epoch)

        ratio = (epoch - warmup_epochs) / (total_epochs - warmup_epochs)
        if mode == "exp":
            return base_lr * power**ratio
        if mode == "linear":
            return base_lr * (1 - ratio)
        if mode == "poly":
            return target_lr + (base_lr - target_lr) * power ** (1 - ratio)
        # cosine
        return target_lr + (base_lr - target_lr) * 0.5 * (1 + math.cos(math.pi * ratio))

    return schedule


def bias_mask(params) -> dict:
    """Pytree mask that is True on leaves whose path contains 'bias'.

    Matches the reference's ``"bias" in key`` test over torch parameter
    names (solver/build.py:13).  In flax, torch's Linear/Conv/BN biases all
    surface as leaves named ``bias``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_bias(path) -> bool:
        return any(
            "bias" in str(getattr(k, "key", getattr(k, "name", ""))) for k in path
        )

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [is_bias(p) for p, _ in flat])


def visual_mask(params) -> dict:
    """Pytree mask that is True on leaves under the top-level ``visual``
    tower (the warm-started backbone ``SOLVER.VISUAL_LR_FACTOR`` scales)."""
    def mask(tree, top=None):
        if not isinstance(tree, dict):
            return top == "visual"
        return {k: mask(v, top if top is not None else k)
                for k, v in tree.items()}

    return mask(params)


def freeze_mask(params) -> dict:
    """Trainable-mask pytree implementing ``cfg.MODEL.FREEZE``: the visual
    stem + layers 1-3 and the whole text tower stop updating (reference
    resnet.py:229-233 freezes stem+layers1-3; gru.py:111-115 freezes the
    text tower).  True = trainable."""
    frozen_visual_prefixes = ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3",
                              "layer1", "layer2", "layer3")

    def mask(tree, path=()):
        if not isinstance(tree, dict):
            top = path[0] if path else ""
            if top == "textual":
                return False
            if top == "visual" and len(path) > 1 and any(
                path[1].startswith(p) for p in frozen_visual_prefixes
            ):
                return False
            return True
        return {k: mask(v, path + (k,)) for k, v in tree.items()}

    return mask(params)


def make_optimizer(cfg, params, trainable_mask=None) -> optax.GradientTransformation:
    """Build the optimizer.  The learning rate is injected per-step via
    ``optax.inject_hyperparams``-style scaling: the trainer passes the
    current epoch's lr through opt_state (see ``engine/state.py``).

    Args:
      params: model params (used to build the bias/non-bias masks).
      trainable_mask: optional bool pytree; False leaves get zero updates
        (the functional equivalent of ``requires_grad=False`` /
        ``cfg.MODEL.FREEZE``).
    """
    b_mask = bias_mask(params)
    not_b_mask = jax.tree.map(lambda m: not m, b_mask)
    visual_lr_factor = float(cfg.SOLVER.VISUAL_LR_FACTOR)
    v_mask = visual_mask(params) if visual_lr_factor != 1.0 else None

    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    bias_lr_factor = float(cfg.SOLVER.BIAS_LR_FACTOR)

    chain = []
    # Torch-style (coupled) L2: grad += wd * param, before Adam moments.
    if wd:
        chain.append(optax.masked(optax.add_decayed_weights(wd), not_b_mask))
    if wd_bias:
        chain.append(optax.masked(optax.add_decayed_weights(wd_bias), b_mask))

    opt = cfg.SOLVER.OPTIMIZER
    if opt in ("Adam", "AdamW"):
        if opt == "AdamW":
            # Decoupled decay applied with Adam; reference uses torch AdamW.
            chain = []
        chain.append(
            optax.scale_by_adam(
                b1=cfg.SOLVER.ADAM_ALPHA, b2=cfg.SOLVER.ADAM_BETA, eps=1e-8
            )
        )
        if opt == "AdamW":
            if wd:
                chain.append(optax.masked(optax.add_decayed_weights(wd), not_b_mask))
            if wd_bias:
                chain.append(
                    optax.masked(optax.add_decayed_weights(wd_bias), b_mask)
                )
    elif opt == "SGD":
        chain.append(optax.trace(decay=cfg.SOLVER.SGD_MOMENTUM, nesterov=False))
    else:
        raise NotImplementedError(opt)

    # Per-step lr comes in through inject_hyperparams so the trainer can set
    # it each epoch without rebuilding the optimizer.
    def lr_scaled(learning_rate):
        extra = []
        if v_mask is not None:
            extra.append(
                optax.masked(optax.scale(visual_lr_factor), v_mask))
        return optax.chain(
            *chain,
            optax.masked(optax.scale(bias_lr_factor), b_mask),
            *extra,
            optax.scale(-learning_rate),
        )

    tx = optax.inject_hyperparams(lr_scaled)(learning_rate=cfg.SOLVER.BASE_LR)

    if trainable_mask is not None:
        frozen_mask = jax.tree.map(lambda m: not m, trainable_mask)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx


def set_learning_rate(opt_state, lr):
    """Functionally set the injected learning rate in the optimizer state."""
    return jax.tree.map(
        lambda x: x,
        _replace_hyperparam(opt_state, "learning_rate", lr),
    )


def _replace_hyperparam(opt_state, name, value):
    if hasattr(opt_state, "hyperparams") and name in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp[name] = jnp.asarray(value, dtype=jnp.float32)
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_replace_hyperparam(s, name, value) for s in opt_state)
    return opt_state
