#!/usr/bin/env python
"""Export a trained checkpoint to the reference's torch ``.pth`` layout.

The inverse of the importer (`utils/weight_convert.py:
convert_textreid_checkpoint`): a model trained by this framework becomes a
state dict the upstream torch code loads unchanged (reference
checkpoint.py:40-47 ``{"model": ...}`` envelope) — query towers under
``visual_model.``/``textual_model.``, embed layers and loss projection
under ``embed_model.``, MoCo key encoders/queues/pointer in the
reference's buffer shapes (moco_head/head.py:53-62).  Import -> export
round-trips bit-exactly (tests/test_export_torch.py) except BN
``num_batches_tracked`` counters (re-emitted as 0) and the attnpool
pos-embed grid; only the bi-GRU textual tower is exportable (the
reference has no transformer branch).

Usage:
  python tools/export_torch.py --root $ROOT \
      --config-file configs/cuhkpedes/moco_gru_cliprn50_ls_bs128_2048.yaml \
      --checkpoint-file output/.../best \
      --output exported.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textreid_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="./")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--checkpoint-file", required=True,
                        help="orbax directory (or torch .pth to re-export)")
    parser.add_argument("--output", required=True,
                        help=".pth file to write")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax

    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.utils import setup_logger
    from textreid_tpu.utils.bootstrap import build_eval_state
    from textreid_tpu.utils.weight_convert import (
        export_textreid_checkpoint,
        save_torch_state_dict,
    )

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.ROOT = args.root
    cfg.freeze()

    logger = setup_logger("PersonSearch", "", jax.process_index())

    # Parameter shapes come from the config; no dataset needed on disk.
    _, state, _ = build_eval_state(cfg, args.checkpoint_file,
                                   need_loaders=False)

    pieces = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "constants": jax.device_get(state.constants),
    }
    if state.key_params is not None:
        pieces.update(
            key_params=jax.device_get(state.key_params),
            key_batch_stats=jax.device_get(state.key_batch_stats),
            v_queue=jax.device_get(state.v_queue),
            t_queue=jax.device_get(state.t_queue),
            id_queue=jax.device_get(state.id_queue),
            queue_ptr=jax.device_get(state.queue_ptr),
        )

    sd = export_textreid_checkpoint(pieces, cfg)
    save_torch_state_dict(sd, args.output)
    logger.info("Wrote %s: %d tensors (reference layout, head=%s)",
                args.output, len(sd), cfg.MODEL.EMBEDDING.EMBED_HEAD)


if __name__ == "__main__":
    main()
