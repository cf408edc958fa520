#!/usr/bin/env python
"""Training CLI.

Counterpart of `/root/reference/train_net.py`: same argument surface
(``--root``, ``--config-file``, ``--resume-from``, ``--use-tensorboard``,
trailing yacs-style ``opts`` overrides), seeded runs, output directory
derived from the config path, config echo into the log.  TPU-native
replacements: a ``jax.sharding.Mesh`` data axis instead of NCCL process
groups (multi-process via ``jax.distributed.initialize`` when
``JAX_COORDINATOR`` is set), orbax checkpoints, optax solver.
"""

import argparse
import logging
import os
import random

import numpy as np

import jax

from textreid_tpu.utils.platform import (
    ensure_platform,
    setup_compilation_cache,
)

ensure_platform()


def build_everything(cfg, logger):
    import jax.numpy as jnp

    from textreid_tpu.data import make_data_loader
    from textreid_tpu.engine import create_train_state
    from textreid_tpu.models import build_model
    from textreid_tpu.parallel import make_mesh
    from textreid_tpu.solver import make_lr_schedule, make_optimizer
    from textreid_tpu.utils.vocab import frozen_table_initializer

    process_shard = None
    if cfg.TPU.PROCESS_SHARD_DATA and jax.process_count() > 1:
        process_shard = (jax.process_index(), jax.process_count())
        logger.info(
            "Per-host input sharding: process %d/%d decodes %d of %d "
            "images per batch", process_shard[0], process_shard[1],
            cfg.SOLVER.IMS_PER_BATCH // process_shard[1],
            cfg.SOLVER.IMS_PER_BATCH,
        )
    data_loader = make_data_loader(cfg, is_train=True,
                                   process_shard=process_shard)
    data_loader_val = make_data_loader(cfg, is_train=False)

    from textreid_tpu.utils.platform import compute_dtype

    dtype = compute_dtype(cfg)
    use_pallas = bool(cfg.TPU.GRU_PALLAS) and jax.default_backend() == "tpu"
    model = build_model(cfg, frozen_table_initializer(cfg), dtype=dtype,
                        use_pallas=use_pallas)

    sample = next(iter(data_loader))
    sample.pop("valid", None)

    # init params to size the optimizer masks (jitted: unjitted init runs
    # op-by-op on the device and is pathologically slow on remote TPUs)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(cfg.SEED),
        jnp.asarray(sample["pixels"]),
        jnp.asarray(sample["token_ids"]),
        jnp.asarray(sample["lengths"]),
        method="init_all",
    ))()
    trainable_mask = None
    if cfg.MODEL.FREEZE:
        from textreid_tpu.solver.build import freeze_mask

        trainable_mask = freeze_mask(variables["params"])
        logging.getLogger("PersonSearch.train").info(
            "MODEL.FREEZE: visual stem+layers1-3 and the text tower are "
            "frozen (reference resnet.py:229-233, gru.py:111-115)"
        )

    tx = make_optimizer(cfg, variables["params"], trainable_mask)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(cfg.SEED),
                               sample, global_batch=cfg.SOLVER.IMS_PER_BATCH)

    mesh = (make_mesh(cfg.TPU.DATA_PARALLEL, cfg.TPU.MODEL_PARALLEL,
                      num_slices=cfg.TPU.NUM_SLICES)
            if jax.device_count() > 1 else None)
    lr_schedule = make_lr_schedule(cfg)
    return model, state, tx, data_loader, data_loader_val, mesh, lr_schedule


def train(cfg, output_dir, resume_from, use_tensorboard):
    from textreid_tpu.engine import do_train
    from textreid_tpu.utils import (
        Checkpointer,
        MetricLogger,
        TensorboardLogger,
        setup_logger,
    )
    from textreid_tpu.utils.weight_convert import (
        convert_textreid_checkpoint,
        load_clip_visual,
        load_torch_state_dict,
        merge_pretrained,
    )

    logger = setup_logger("PersonSearch", output_dir, jax.process_index())
    setup_compilation_cache(cfg)
    (model, state, tx, data_loader, data_loader_val, mesh,
     lr_schedule) = build_everything(cfg, logger)

    # Pretrained visual weights: CLIP jit archives, mirroring reference
    # m_resnet.py:294-307 path conventions (+ the ViT extension).
    visual = None
    clip_archive = None  # the archive also holds the text tower
    clip_sd = None  # cached state dict so the archive loads at most once
    if cfg.MODEL.VISUAL_MODEL.startswith("m_resnet"):
        arch = "RN101" if cfg.MODEL.VISUAL_MODEL.endswith("101") else "RN50"
        clip_path = os.path.join(cfg.ROOT, "pretrained", "clip", f"{arch}.pt")
        if os.path.isfile(clip_path):
            logger.info("Loading CLIP visual weights from %s", clip_path)
            clip_sd = load_torch_state_dict(clip_path)
            visual = load_clip_visual(
                clip_path, arch, model.visual.final_grid, sd=clip_sd
            )
            clip_archive = clip_path
    elif cfg.MODEL.VISUAL_MODEL.startswith("clip_vit"):
        names = {"clip_vit_b32": "ViT-B-32", "clip_vit_b16": "ViT-B-16",
                 "clip_vit_l14": "ViT-L-14"}
        clip_path = os.path.join(
            cfg.ROOT, "pretrained", "clip",
            f"{names.get(cfg.MODEL.VISUAL_MODEL, 'ViT-B-16')}.pt",
        )
        if os.path.isfile(clip_path):
            from textreid_tpu.utils.weight_convert import (
                convert_clip_vit,
                load_torch_state_dict as _load_sd,
            )

            logger.info("Loading CLIP ViT weights from %s", clip_path)
            clip_sd = _load_sd(clip_path)
            visual = convert_clip_vit(clip_sd, model.visual.layers,
                                      final_grid=model.visual.grid)
            visual.setdefault("batch_stats", {})
            clip_archive = clip_path
    if visual is not None:
        merged = merge_pretrained(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"params": {"visual": visual["params"]},
             "batch_stats": {"visual": visual["batch_stats"]}},
        )
        state = state.replace(
            params=merged["params"], batch_stats=merged["batch_stats"]
        )
        if state.key_params is not None:
            kmerged = merge_pretrained(
                {"params": state.key_params,
                 "batch_stats": state.key_batch_stats},
                {"params": {"visual": visual["params"]},
                 "batch_stats": {"visual": visual["batch_stats"]}},
            )
            state = state.replace(
                key_params=kmerged["params"],
                key_batch_stats=kmerged["batch_stats"],
            )

    # Pretrained textual weights: the text half of the same CLIP archive
    # (full-CLIP extension; the reference's GRU branch has no counterpart).
    if cfg.MODEL.TEXTUAL_MODEL in ("transformer", "clip_transformer"):
        if clip_archive is None:
            # Visual tower is a non-CLIP family (or its archive is absent);
            # any CLIP archive provides the text tower.
            clip_dir = os.path.join(cfg.ROOT, "pretrained", "clip")
            for name in ("ViT-B-16.pt", "ViT-B-32.pt", "RN50.pt", "RN101.pt",
                         "ViT-L-14.pt"):
                cand = os.path.join(clip_dir, name)
                if os.path.isfile(cand):
                    clip_archive = cand
                    break
        if clip_archive is not None:
            from textreid_tpu.utils.weight_convert import convert_clip_text

            logger.info("Loading CLIP text weights from %s", clip_archive)
            if clip_sd is None:
                clip_sd = load_torch_state_dict(clip_archive)
            textual = convert_clip_text(
                clip_sd, model.textual.layers,
                context_length=model.textual.context_length,
            )
            tmerged = merge_pretrained(
                {"params": state.params},
                {"params": {"textual": textual["params"]}},
            )
            state = state.replace(params=tmerged["params"])
            if state.key_params is not None:
                kmerged = merge_pretrained(
                    {"params": state.key_params},
                    {"params": {"textual": textual["params"]}},
                )
                state = state.replace(key_params=kmerged["params"])

    arguments = {"iteration": 0, "epoch": 0,
                 "max_epoch": cfg.SOLVER.NUM_EPOCHS}

    checkpointer = Checkpointer(save_dir=output_dir,
                                async_save=bool(cfg.TPU.ASYNC_CHECKPOINT))

    # Full-model warm start (reference train_net.py:64-68): orbax dir or
    # torch .pth both accepted.
    if cfg.MODEL.WEIGHT != "imagenet":
        if os.path.isdir(cfg.MODEL.WEIGHT):
            state = checkpointer.load(cfg.MODEL.WEIGHT, state)
        elif os.path.isfile(cfg.MODEL.WEIGHT):
            # install_torch_checkpoint carries the MoCo key encoders,
            # queues, and pointer too — the reference's load_state_dict
            # restores those buffers wholesale (checkpoint.py:40-47).
            from textreid_tpu.utils.bootstrap import install_torch_checkpoint

            sd = load_torch_state_dict(cfg.MODEL.WEIGHT)
            state = install_torch_checkpoint(
                state, convert_textreid_checkpoint(sd, cfg))
        else:
            raise IOError(f"{cfg.MODEL.WEIGHT} is not a checkpoint file")

    if resume_from == "auto":
        # Latest epoch checkpoint in the output dir (preemption recovery).
        import re

        candidates = sorted(
            (d for d in os.listdir(output_dir)
             if re.fullmatch(r"epoch_\d+", d)
             and os.path.isdir(os.path.join(output_dir, d))),
            key=lambda d: int(d.split("_")[1]),
        )
        resume_from = (
            os.path.join(output_dir, candidates[-1]) if candidates else None
        )

        # A SIGTERM 'preempt' checkpoint (engine/trainer.py) wins when it
        # is strictly newer (by meta iteration) than the last epoch
        # boundary; a stale one from an older interruption loses.
        def _meta_iteration(path):
            import json

            try:
                with open(path + ".meta.json") as f:
                    return int(json.load(f).get("iteration", -1))
            except (OSError, ValueError):
                return -1

        preempt_path = os.path.join(output_dir, "preempt")
        if os.path.isdir(preempt_path) and _meta_iteration(preempt_path) > (
                _meta_iteration(resume_from) if resume_from else -1):
            resume_from = preempt_path
        if resume_from:
            logger.info("Auto-resuming from %s", resume_from)
        else:
            logger.info("No prior checkpoint found; starting fresh")
    if resume_from:
        state, extra = checkpointer.resume(resume_from, state)
        arguments.update(extra)
        # progress (epoch/iteration/best_top1) comes from the checkpoint,
        # but the epoch BUDGET is this run's config: a resume launched
        # with a different SOLVER.NUM_EPOCHS must honor it, not the value
        # frozen into the meta at save time.
        arguments["max_epoch"] = cfg.SOLVER.NUM_EPOCHS

    if use_tensorboard:
        meters = TensorboardLogger(
            log_dir=os.path.join(output_dir, "tensorboard"),
            start_iter=arguments["iteration"],
        )
    else:
        meters = MetricLogger()

    do_train(
        cfg, model, state, tx, data_loader, data_loader_val, checkpointer,
        meters, lr_schedule, arguments, mesh,
    )


def main():
    parser = argparse.ArgumentParser(description="TPU Person Search Training")
    parser.add_argument("--root", default="./", type=str, help="root path")
    parser.add_argument("--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("--resume-from", type=str,
                        help="checkpoint to resume from")
    parser.add_argument("--use-tensorboard", action="store_true", default=False)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="yacs-style dotted config overrides")
    args = parser.parse_args()

    if os.environ.get("JAX_COORDINATOR"):
        from textreid_tpu.utils.platform import distributed_initialize

        distributed_initialize()

    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.utils import makedir, setup_logger

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.ROOT = args.root
    cfg.freeze()

    random.seed(cfg.SEED)
    np.random.seed(cfg.SEED)

    output_dir = os.path.join(
        args.root, "./output", "/".join(args.config_file.split("/")[-2:])[:-5]
    )
    makedir(output_dir)

    logger = setup_logger("PersonSearch", output_dir, jax.process_index())
    logger.info("Using %d devices", jax.device_count())
    logger.info("%s", args)
    if args.config_file:
        with open(args.config_file) as f:
            logger.info("Loaded configuration file %s\n%s", args.config_file,
                        f.read())
    logger.info("Running with config:\n%s", cfg)

    train(cfg, output_dir, args.resume_from, args.use_tensorboard)

    if jax.process_count() > 1:
        # All processes reach the end before any interpreter tears down the
        # coordination service (the reference's synchronize() analogue,
        # lib/utils/comm.py:32-44) — otherwise exits race the shutdown
        # barrier and non-primary ranks abort noisily.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("train_net_exit")


if __name__ == "__main__":
    main()
