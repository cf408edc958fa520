#!/usr/bin/env python
"""Build and persist a serving retrieval index from a trained checkpoint.

Completes the deployment workflow at CLI level: encode a dataset's gallery
images through the visual tower once, L2-normalize, (optionally) quantize
to int8, and write an atomic index file that serving replicas load with
``RetrievalIndex.load_index`` — no re-encoding at boot.  The reference has
no serving story at all (it stops at offline evaluation,
`/root/reference/lib/engine/inference.py`).

Usage:
  python tools/build_index.py --root $ROOT \
      --config-file configs/cuhkpedes/moco_gru_cliprn50_ls_bs128_2048.yaml \
      --checkpoint-file output/.../best \
      --output gallery.idx [--quantize] [--dataset cuhkpedes_test]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textreid_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402

import jax  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="./")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--checkpoint-file", required=True)
    parser.add_argument("--output", required=True,
                        help="index file to write (atomic)")
    parser.add_argument("--quantize", action="store_true",
                        help="also store the int8 per-row-scale form")
    parser.add_argument("--int8-encode", action="store_true",
                        help="encode the gallery with the int8-dataflow "
                        "visual tower (models/int8_tower.py for m_resnet, "
                        "~1.3x; models/int8_vit.py for ViT, ~1.55x; "
                        "interceptor fallback otherwise)")
    parser.add_argument("--text-calib-out", default="",
                        help="also write an npz of dataset captions "
                        "(token_ids, lengths) for serving-side int8 text "
                        "calibration (tools/serve.py --int8-text-calib); "
                        "replicas boot dataset-free, so the calibration "
                        "sample ships next to the index")
    parser.add_argument("--text-calib-rows", type=int, default=2048,
                        help="caption rows to sample into --text-calib-out")
    parser.add_argument("--dataset", default="",
                        help="catalog name; default: first DATASETS.TEST")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.serving import RetrievalIndex
    from textreid_tpu.utils import setup_logger
    from textreid_tpu.utils.bootstrap import build_eval_state
    from textreid_tpu.utils.platform import compute_dtype

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.ROOT = args.root
    if args.dataset:
        cfg.DATASETS.TEST = (args.dataset,)
    cfg.freeze()

    logger = setup_logger("PersonSearch", "", jax.process_index())

    model, state, loaders = build_eval_state(
        cfg, checkpoint_file=args.checkpoint_file, dtype=compute_dtype(cfg)
    )
    loader = loaders[0]

    index = RetrievalIndex(model, state, quantize=args.quantize,
                           int8_encode=args.int8_encode)

    # one gallery row per unique image (the eval protocol's dedupe,
    # evaluation.py:113-115) — meta carries the image ids
    seen = set()
    batches, metas, cur_px, cur_ids = [], [], [], []
    calib_ids, calib_lens = [], []
    batch_size = cfg.TEST.IMS_PER_BATCH
    for item_batch in loader:
        valid = item_batch.get("valid")
        n = int(valid.sum()) if valid is not None else len(
            item_batch["image_ids"])
        if args.text_calib_out and sum(
                len(c) for c in calib_ids) < args.text_calib_rows:
            calib_ids.append(np.asarray(item_batch["token_ids"][:n]))
            calib_lens.append(np.asarray(item_batch["lengths"][:n]))
        for i in range(n):
            img_id = int(item_batch["image_ids"][i])
            if img_id in seen:
                continue
            seen.add(img_id)
            cur_px.append(np.asarray(item_batch["pixels"][i]))
            cur_ids.append(img_id)
            if len(cur_px) == batch_size:
                batches.append(np.stack(cur_px))
                metas.extend(cur_ids)
                cur_px, cur_ids = [], []
    if cur_px:  # pad the tail to the compiled batch shape; the pad rows
        # are dropped from the index after encoding (valid_rows) so a
        # duplicate of the last image can never displace a real result
        pad = batch_size - len(cur_px)
        tail = np.stack(cur_px + [cur_px[-1]] * pad)
        batches.append(tail)
        metas.extend(cur_ids)

    # valid_rows drops the pad rows (and quantizes, when enabled) inside
    # build_gallery, so the index is persist-ready as built
    index.build_gallery(batches, meta=np.asarray(metas),
                        valid_rows=len(metas))
    index.save_index(args.output)
    logger.info("Wrote %s: %d rows x %d dims%s", args.output,
                index.gallery.shape[0], index.gallery.shape[1],
                " (+int8)" if args.quantize else "")
    if args.text_calib_out:
        ids = np.concatenate(calib_ids)[: args.text_calib_rows]
        lens = np.concatenate(calib_lens)[: args.text_calib_rows]
        tmp = args.text_calib_out + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, token_ids=ids.astype(np.int32),
                     lengths=lens.astype(np.int32))
        os.replace(tmp, args.text_calib_out)
        logger.info("Wrote %s: %d caption rows for int8 text calibration",
                    args.text_calib_out, len(ids))


if __name__ == "__main__":
    main()
