#!/usr/bin/env python
"""Input-pipeline throughput: our loader vs the reference torch DataLoader.

Builds one synthetic CUHK-PEDES-schema dataset, then measures end-to-end
host pipeline throughput (decode -> resize -> augment -> collate, train
path with the PK TripletSampler) for BOTH frameworks on the same machine:

* ours: `textreid_tpu.data.make_data_loader` — threaded double-buffered
  loader emitting uint8 NHWC batches (normalize + RandomErasing run
  on-device inside the jitted step, `models/model.py:53-82`, so the host
  does strictly less float work per image than the reference);
* reference: the ACTUAL `/root/reference/lib/data/build.py:70-115` torch
  `DataLoader` (worker processes, host-side normalize/erase, f32 CHW),
  executed via the oracle shims (`tests/oracle_utils.py`).

Epoch 1 is the cold (decode-bound) number; later epochs show our
decoded-image cache (`data/datasets.py`), which the reference lacks —
it re-decodes every epoch.  Writes BENCH_LOADER.json.

Usage:
  python tools/bench_loader.py --ids 64 --imgs-per-id 4 --batch 32 \
      --epochs 3 --output BENCH_LOADER.json
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from textreid_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()


def build_cfg(root, batch, height, width, num_workers):
    from textreid_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.ROOT = root
    cfg.DATASETS.TRAIN = ("cuhkpedes_train",)
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = height, width
    cfg.INPUT.USE_AUG = True
    cfg.SOLVER.IMS_PER_BATCH = batch
    cfg.DATALOADER.IMS_PER_ID = 4
    cfg.DATALOADER.NUM_WORKERS = num_workers
    return cfg


def time_epochs(iter_epoch, epochs):
    """iter_epoch(epoch) -> images consumed; returns per-epoch imgs/s."""
    rates = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        n = iter_epoch(epoch)
        dt = time.perf_counter() - t0
        rates.append(n / dt)
    return rates


def bench_ours(cfg, epochs, cache=False):
    from textreid_tpu.data import make_data_loader

    if cache:
        cfg = cfg.clone()
        cfg.DATALOADER.CACHE_IMAGES = True
    loader = make_data_loader(cfg, is_train=True, seed=0)

    def run(epoch):
        loader.set_epoch(epoch)
        n = 0
        for batch in loader:
            n += int(batch["pixels"].shape[0])
        return n

    return time_epochs(run, epochs)


def bench_reference(cfg, epochs):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle_utils import install_reference_shims

    install_reference_shims()
    from lib.data.build import make_data_loader as ref_make_data_loader

    loader = ref_make_data_loader(cfg, is_train=True)

    def run(epoch):
        n = 0
        for images, captions, _ in loader:
            n += int(images.shape[0])
        return n

    return time_epochs(run, epochs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ids", type=int, default=64)
    parser.add_argument("--imgs-per-id", type=int, default=4)
    parser.add_argument("--raw-height", type=int, default=300)
    parser.add_argument("--raw-width", type=int, default=100,
                        help="on-disk JPEG size (CUHK-PEDES crops are "
                        "~100x300 pedestrians)")
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--skip-reference", action="store_true")
    parser.add_argument("--output", default="BENCH_LOADER.json")
    args = parser.parse_args()

    from textreid_tpu.data import make_synthetic_dataset

    with tempfile.TemporaryDirectory() as root:
        ds = os.path.join(root, "datasets", "cuhkpedes")
        make_synthetic_dataset(
            ds, num_identities=args.ids, images_per_id=args.imgs_per_id,
            image_size=(args.raw_height, args.raw_width), max_tokens=60,
            vocab_size=5000, split="train", seed=0,
        )
        n_images = args.ids * args.imgs_per_id
        cfg = build_cfg(root, args.batch, args.height, args.width,
                        args.num_workers)

        ours = bench_ours(cfg, args.epochs)
        ours_cached = bench_ours(cfg, args.epochs, cache=True)
        ref = None
        if not args.skip_reference:
            ref = bench_reference(cfg, args.epochs)

    result = {
        "n_images": n_images,
        "raw_size": [args.raw_height, args.raw_width],
        "target_size": [args.height, args.width],
        "batch": args.batch,
        "num_workers": args.num_workers,
        "host_cpus": os.cpu_count(),
        "epochs": args.epochs,
        "ours_imgs_per_s_by_epoch": [round(r, 1) for r in ours],
        "ours_cold_imgs_per_s": round(ours[0], 1),
        "ours_warm_imgs_per_s": round(max(ours[1:]) if len(ours) > 1
                                      else ours[0], 1),
        "ours_cached_imgs_per_s_by_epoch": [round(r, 1) for r in ours_cached],
        "ours_cached_warm_imgs_per_s": round(
            max(ours_cached[1:]) if len(ours_cached) > 1
            else ours_cached[0], 1),
        "notes": [
            "ours emits device-ready uint8 NHWC batches (normalize+erase "
            "run on-device); the reference emits host-normalized f32 CHW",
            "ours_cached enables DATALOADER.CACHE_IMAGES (decoded-image "
            "cache; warm epochs skip JPEG decode); the reference "
            "re-decodes every epoch",
        ],
    }
    if ref is not None:
        result.update(
            reference_imgs_per_s_by_epoch=[round(r, 1) for r in ref],
            reference_cold_imgs_per_s=round(ref[0], 1),
            reference_warm_imgs_per_s=round(max(ref[1:]) if len(ref) > 1
                                            else ref[0], 1),
            speedup_cold=round(ours[0] / ref[0], 2),
            speedup_warm=round(
                (max(ours[1:]) if len(ours) > 1 else ours[0])
                / (max(ref[1:]) if len(ref) > 1 else ref[0]), 2),
        )

    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
