#!/usr/bin/env python
"""Quickstart: train, evaluate, and serve on a synthetic dataset.

Runs anywhere (CPU ok) in a couple of minutes; swap the synthetic dataset
for real CUHK-PEDES (see DATA.md) to reproduce the paper workflow.

    python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textreid_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402

import jax  # noqa: E402


def main():
    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.data import make_data_loader, make_synthetic_dataset
    from textreid_tpu.engine import create_train_state, do_train, inference
    from textreid_tpu.models import build_model
    from textreid_tpu.serving import RetrievalIndex
    from textreid_tpu.solver import make_lr_schedule, make_optimizer
    from textreid_tpu.utils import Checkpointer, MetricLogger, setup_logger
    from textreid_tpu.utils.platform import compute_dtype

    root = tempfile.mkdtemp(prefix="textreid_quickstart_")
    ds = os.path.join(root, "datasets", "cuhkpedes")
    make_synthetic_dataset(ds, num_identities=8, images_per_id=4,
                           image_size=(64, 32), max_tokens=16, split="train")
    make_synthetic_dataset(ds, num_identities=4, images_per_id=2,
                           image_size=(64, 32), max_tokens=16, split="test",
                           seed=1)

    cfg = get_default_cfg()
    cfg.ROOT = root
    cfg.DATASETS.TRAIN = ("cuhkpedes_train",)
    cfg.DATASETS.TEST = ("cuhkpedes_test",)
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 64, 32
    cfg.INPUT.MAX_TEXT_LENGTH = 16
    cfg.INPUT.USE_AUG = True
    cfg.MODEL.VISUAL_MODEL = "resnet18"
    cfg.MODEL.TEXTUAL_MODEL = "bigru"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.MODEL.GRU.VOCABULARY_SIZE = 100
    cfg.MODEL.GRU.EMBEDDING_SIZE = 32
    cfg.MODEL.GRU.NUM_UNITS = 32
    cfg.MODEL.EMBEDDING.EMBED_HEAD = "moco"
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = 32
    cfg.MODEL.EMBEDDING.EPSILON = 0.1
    cfg.MODEL.MOCO.K = 16
    cfg.MODEL.MOCO.FC = False
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.NUM_EPOCHS = 2
    cfg.SOLVER.BASE_LR = 3e-4
    cfg.SOLVER.WARMUP_EPOCHS = 0
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.DATALOADER.IMS_PER_ID = 2
    cfg.freeze()

    out_dir = os.path.join(root, "output")
    setup_logger("PersonSearch", out_dir)

    # --- build ------------------------------------------------------------
    model = build_model(cfg, dtype=compute_dtype(cfg))
    train_loader = make_data_loader(cfg, is_train=True)
    val_loaders = make_data_loader(cfg, is_train=False)
    sample = next(iter(train_loader))
    sample.pop("valid")
    import jax.numpy as jnp

    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["pixels"]),
        jnp.asarray(sample["token_ids"]), jnp.asarray(sample["lengths"]),
        method="init_all"))()["params"]
    tx = make_optimizer(cfg, params)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), sample)

    # --- train (2 epochs, with validation + checkpoints) -------------------
    state = do_train(
        cfg, model, state, tx, train_loader, val_loaders,
        Checkpointer(save_dir=out_dir), MetricLogger(),
        make_lr_schedule(cfg), {"max_epoch": cfg.SOLVER.NUM_EPOCHS},
    )

    # --- evaluate ----------------------------------------------------------
    top1 = inference(model, state, val_loaders[0], rerank=True)
    print(f"t2i Rank-1 after {cfg.SOLVER.NUM_EPOCHS} epochs: {top1:.2f}")

    # --- serve -------------------------------------------------------------
    index = RetrievalIndex(model, state, query_batch=8, use_pallas=False)
    rng = np.random.RandomState(0)
    gallery_batches = [rng.randint(0, 255, (4, 64, 32, 3), dtype=np.uint8)
                       for _ in range(2)]
    index.build_gallery(gallery_batches, meta=np.arange(8))
    token_ids = rng.randint(1, 100, (2, 16)).astype(np.int32)
    lengths = np.array([16, 7], np.int32)
    scores, matches = index.search(token_ids, lengths, k=3)
    print("serving top-3 matches:", matches.tolist())

    # --- or over HTTP (textreid_tpu/server.py; tools/serve.py for the CLI)
    import json
    import threading
    import urllib.request

    from textreid_tpu.server import RetrievalService, make_server

    service = RetrievalService(index, max_text_length=16)
    httpd = make_server(service)  # port=0 -> OS-assigned
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    host, port = httpd.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/search",
        data=json.dumps({"token_ids": token_ids.tolist(),
                         "lengths": lengths.tolist(), "k": 3}).encode())
    with urllib.request.urlopen(req) as resp:
        print("HTTP top-3 matches:", json.loads(resp.read())["meta"])
    httpd.shutdown()
    print("quickstart OK")


if __name__ == "__main__":
    main()
