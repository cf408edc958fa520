#!/usr/bin/env python
"""Evaluation CLI.

Counterpart of `/root/reference/test_net.py`: same argument surface
(``--root``, ``--config-file``, ``--checkpoint-file``, ``--load-result``,
trailing opts), one output folder per test set, full eval with re-ranking.
Accepts either our orbax checkpoints or reference torch ``.pth`` files
(converted on the fly).
"""

import argparse
import os

import jax

from textreid_tpu.utils.platform import ensure_platform

ensure_platform()


def main():
    parser = argparse.ArgumentParser(description="TPU Image-Text Matching Inference")
    parser.add_argument("--root", default="./", type=str)
    parser.add_argument("--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("--checkpoint-file", default="", metavar="FILE", type=str)
    parser.add_argument("--load-result", action="store_true",
                        help="replay a saved similarity matrix")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if os.environ.get("JAX_COORDINATOR"):
        from textreid_tpu.utils.platform import distributed_initialize

        distributed_initialize()

    import jax.numpy as jnp

    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.data import make_data_loader
    from textreid_tpu.engine import create_train_state, inference
    from textreid_tpu.models import build_model
    from textreid_tpu.parallel import make_mesh
    from textreid_tpu.solver import make_optimizer
    from textreid_tpu.utils import Checkpointer, makedir, setup_logger
    from textreid_tpu.utils.vocab import frozen_table_initializer
    from textreid_tpu.utils.weight_convert import (
        convert_textreid_checkpoint,
        load_torch_state_dict,
        merge_pretrained,
    )

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.ROOT = args.root
    cfg.freeze()

    from textreid_tpu.utils.platform import setup_compilation_cache

    setup_compilation_cache(cfg)

    output_dir = os.path.join(
        args.root, "./output", "/".join(args.config_file.split("/")[-2:])[:-5]
    )

    data_loaders_val = make_data_loader(cfg, is_train=False)

    from textreid_tpu.utils.platform import compute_dtype

    dtype = compute_dtype(cfg)
    use_pallas = bool(cfg.TPU.GRU_PALLAS) and jax.default_backend() == "tpu"
    model = build_model(cfg, frozen_table_initializer(cfg), dtype=dtype,
                        use_pallas=use_pallas)

    sample = next(iter(data_loaders_val[0]))
    sample.pop("valid", None)
    init_fn = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["pixels"]),
        jnp.asarray(sample["token_ids"]), jnp.asarray(sample["lengths"]),
        method="init_all",
    ))
    tx = make_optimizer(cfg, init_fn()["params"])
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), sample)

    checkpointer = Checkpointer(save_dir=output_dir)
    if args.checkpoint_file:
        if os.path.isdir(args.checkpoint_file):
            state = checkpointer.load(args.checkpoint_file, state)
        else:
            sd = load_torch_state_dict(args.checkpoint_file)
            converted = convert_textreid_checkpoint(sd, cfg)
            merged = merge_pretrained(
                {"params": state.params, "batch_stats": state.batch_stats},
                {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]},
            )
            state = state.replace(params=merged["params"],
                                  batch_stats=merged["batch_stats"])

    mesh = (make_mesh(cfg.TPU.DATA_PARALLEL, cfg.TPU.MODEL_PARALLEL,
                      num_slices=cfg.TPU.NUM_SLICES)
            if jax.device_count() > 1 else None)

    for dataset_name, loader in zip(cfg.DATASETS.TEST, data_loaders_val):
        output_folder = os.path.join(output_dir, "inference", dataset_name)
        makedir(output_folder)
        logger = setup_logger("PersonSearch", output_folder,
                              jax.process_index())
        logger.info("Using %d devices", jax.device_count())
        logger.info("%s", cfg)
        inference(
            model, state, loader,
            dataset_name=dataset_name,
            output_folder=output_folder if args.load_result else "",
            save_data=args.load_result,
            rerank=True,
            mesh=mesh,
        )

    if jax.process_count() > 1:
        # see train_net.py: exit-barrier so ranks do not race the
        # coordination-service shutdown
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("test_net_exit")


if __name__ == "__main__":
    main()
