"""Training engine.

Counterpart of `/root/reference/lib/engine/trainer.py:38-139`: the
epoch x step loop with per-iteration telemetry (ETA, lr, losses), a
per-epoch LR schedule step (trainer.py:121), periodic validation gating the
"best" checkpoint on t2i Rank-1 (trainer.py:123-128) and periodic epoch
checkpoints (trainer.py:130-131).

TPU-native structure: the entire iteration body — both encoder forwards,
the MoCo key/EMA/queue machinery, losses, backward and the optimizer
update — is one jitted program over the global batch; host work is only
data loading, lr scheduling (per epoch) and logging.
"""

from __future__ import annotations

import datetime
import logging
import time
import jax

from ..parallel.mesh import shard_batch, shard_local_batch, shard_state
from ..solver.build import set_learning_rate
from .inference import inference
from .steps import make_train_step


def device_prefetch(iterator, mesh=None, depth: int = 2,
                    process_sharded: bool = False):
    """Keep ``depth`` batches resident on device ahead of consumption.

    XLA dispatch is async but ``device_put`` of host arrays is not free;
    staging the next batch's transfer while the current step executes hides
    host->device latency (the reference relies on DataLoader workers +
    synchronous ``.to(device)``, trainer.py:78-79).

    ``process_sharded=True`` means the iterator yields per-host shards (the
    ``process_shard`` loader mode) to be stitched into global arrays."""
    import collections

    queue = collections.deque()

    def put(batch):
        batch.pop("valid", None)
        if process_sharded and mesh is not None:
            return shard_local_batch(batch, mesh)
        if mesh is not None:
            return shard_batch(batch, mesh)
        return {k: jax.device_put(v) for k, v in batch.items()}

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _isfinite(v: float) -> bool:
    return v == v and v not in (float("inf"), float("-inf"))


def do_train(
    cfg,
    model,
    state,
    tx,
    data_loader,
    data_loader_val,
    checkpointer,
    meters,
    lr_schedule,
    arguments: dict,
    mesh=None,
    preempt_guard=None,
):
    logger = logging.getLogger("PersonSearch.trainer")
    logger.info("Start training")

    if preempt_guard is None:
        from ..utils.preempt import PreemptionGuard

        preempt_guard = PreemptionGuard(enabled=bool(cfg.TPU.PREEMPT_SAVE))

    # any exit — normal, preempt, or exception — must restore the
    # previous SIGTERM handler and commit in-flight async saves; an
    # exception leaving the guard installed would silently eat the
    # scheduler's grace SIGTERM while the process unwinds.
    try:
        max_epoch = int(arguments.get("max_epoch", cfg.SOLVER.NUM_EPOCHS))
        epoch = int(arguments.get("epoch", 0))
        iteration = int(arguments.get("iteration", 0))
        checkpoint_period = cfg.SOLVER.CHECKPOINT_PERIOD
        evaluate_period = cfg.SOLVER.EVALUATE_PERIOD
        steps_per_epoch = len(data_loader)
        max_iter = max_epoch * steps_per_epoch

        donate = (0,) if cfg.TPU.DONATE_STATE else ()
        out_shardings = None
        if mesh is not None:
            state = shard_state(
                state, mesh,
                optimizer_sharding=bool(cfg.TPU.OPTIMIZER_SHARDING))
            if cfg.TPU.OPTIMIZER_SHARDING:
                # Pin the output state to the input placements.  Left to
                # propagation, GSPMD may emit the new params data-sharded
                # (their only producer is the shard-local Adam update),
                # which would flip the state layout after step 1 and force
                # a recompile; pinning keeps params replicated and moments
                # sharded every step.  Metrics stay replicated scalars.
                from ..parallel.mesh import replicated

                out_shardings = (
                    jax.tree_util.tree_map(lambda x: x.sharding, state),
                    replicated(mesh),
                )
        train_step = jax.jit(make_train_step(model, tx, cfg),
                             donate_argnums=donate,
                             out_shardings=out_shardings)

        best_top1 = float(arguments.get("best_top1", 0.0))
        start_training_time = time.time()
        end = time.time()

        while epoch < max_epoch:
            data_loader.set_epoch(epoch)
            # Per-epoch LR (reference trainer.py:121 steps the scheduler per
            # epoch; epoch e trains at lr(last_epoch = e) with 0-based epochs).
            lr = lr_schedule(epoch)
            state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

            epoch += 1
            arguments["epoch"] = epoch

            log_period = max(1, int(cfg.SOLVER.LOG_PERIOD))
            process_sharded = getattr(data_loader, "process_shard", None) is not None
            for step, batch in enumerate(
                device_prefetch(iter(data_loader), mesh,
                                process_sharded=process_sharded)
            ):
                data_time = time.time() - end
                iteration += 1
                arguments["iteration"] = iteration

                state, metrics = train_step(state, batch)

                batch_time = time.time() - end
                end = time.time()
                meters.update(time=batch_time, data=data_time)

                if step % log_period == 0 or step == steps_per_epoch - 1:
                    # Fetching metrics syncs with the device; do it only at log
                    # boundaries so steps in between stay fully async.
                    host_metrics = {k: float(v) for k, v in metrics.items()}
                    if cfg.TPU.DEBUG_NANS:
                        bad = [k for k, v in host_metrics.items()
                               if not _isfinite(v)]
                        if bad:
                            raise FloatingPointError(
                                f"Non-finite training metrics at iteration "
                                f"{iteration}: {bad}"
                            )
                    meters.update(**host_metrics)
                    eta_seconds = meters.time.global_avg * (max_iter - iteration)
                    eta = datetime.timedelta(seconds=int(eta_seconds))
                    logger.info(
                        "eta: %s  epoch [%d][%d/%d]  %s  lr: %.6f",
                        eta, epoch, step, steps_per_epoch, meters, lr,
                    )
                    if preempt_guard.triggered_global():
                        # SIGTERM mid-epoch: save under 'preempt' with the
                        # meta pinned one epoch back so resume re-runs the
                        # interrupted epoch (epoch-granular semantics; the
                        # state itself is mid-epoch, strictly more trained).
                        logger.warning(
                            "Preemption signal at iteration %d; saving "
                            "'preempt' checkpoint and exiting", iteration)
                        checkpointer.save(
                            "preempt", state,
                            **{**arguments, "epoch": epoch - 1})
                        return state  # finally: wait + uninstall

            if evaluate_period and epoch % evaluate_period == 0 and data_loader_val:
                top1 = inference(
                    model, state, data_loader_val[0],
                    dataset_name="val", save_data=False, rerank=False, mesh=mesh,
                )
                meters.update(top1=float(top1))
                if top1 > best_top1:
                    best_top1 = top1
                    arguments["best_top1"] = best_top1
                    checkpointer.save("best", state, **arguments)

            if checkpoint_period and epoch % checkpoint_period == 0:
                checkpointer.save(f"epoch_{epoch}", state, **arguments)
                checkpointer.prune_epochs(cfg.SOLVER.CHECKPOINT_KEEP)

        # commit any in-flight async checkpoint before declaring training done
        checkpointer.wait()
        # during training an async-in-flight epoch is invisible to the prune
        # pass (not on disk yet), so up to KEEP+1 can transiently exist; this
        # post-commit prune makes the final state exact.
        checkpointer.prune_epochs(cfg.SOLVER.CHECKPOINT_KEEP)
        total_time = time.time() - start_training_time
        logger.info(
            "Total training time: %s (%.4f s / it)",
            datetime.timedelta(seconds=int(total_time)),
            total_time / max(max_iter, 1),
        )
        return state
    finally:
        checkpointer.wait()
        preempt_guard.uninstall()
