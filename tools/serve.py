#!/usr/bin/env python
"""Run the online text -> person retrieval service.

Boots the towers from a checkpoint, loads (or builds) a gallery index, and
serves JSON search over HTTP (`textreid_tpu/server.py`).  The reference
stops at offline evaluation; this is the deployment end of the pipeline:

  python tools/serve.py --root $ROOT \
      --config-file configs/cuhkpedes/moco_gru_cliprn50_ls_bs128_2048.yaml \
      --checkpoint-file output/.../best \
      --index-file gallery.idx \
      [--vocab-file word2id.json] [--port 8080] [--quantize]

Then:
  curl localhost:8080/healthz
  curl -XPOST localhost:8080/search -d '{"token_ids": [[12, 7, 44]], "k": 5}'
  # person re-id by example: raw uint8 NHWC bytes at INPUT.HEIGHTxWIDTH
  curl -XPOST localhost:8080/search_image \
      -d "{\"images_b64\": [\"$(base64 -w0 crop_384x128.raw)\"], \"k\": 5}"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textreid_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="./")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--checkpoint-file", required=True)
    parser.add_argument("--index-file", required=True,
                        help="gallery index from tools/build_index.py")
    parser.add_argument("--vocab-file", default="",
                        help="word -> id JSON enabling plain-text queries")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--query-batch", type=int, default=64)
    parser.add_argument("--batch-window-ms", default="0",
                        help="coalesce concurrent requests into one device "
                        "batch within this window (0 = off, 'auto' = size "
                        "from the measured dispatch time)")
    parser.add_argument("--quantize", action="store_true",
                        help="serve int8 scoring (index must carry it or "
                        "it is re-quantized at load)")
    parser.add_argument("--int8-text-calib", default="",
                        help="caption npz (token_ids, lengths) from "
                        "tools/build_index.py --text-calib-out; enables the "
                        "int8-dataflow text transformer for query encode "
                        "(TextTransformer towers only)")
    parser.add_argument("--reload-dir", default="",
                        help="enable POST /reload_index for index files "
                        "inside this directory (disabled when empty)")
    parser.add_argument("--k-buckets", default="10,100,1000",
                        help="comma-separated canonical k values; the "
                        "largest is the service's max k (each bucket "
                        "compiles one ranking program)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.server import (
        RetrievalService,
        SimpleTokenizer,
        make_server,
    )
    from textreid_tpu.serving import RetrievalIndex
    from textreid_tpu.utils import setup_logger
    from textreid_tpu.utils.bootstrap import build_eval_state
    from textreid_tpu.utils.platform import compute_dtype

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.ROOT = args.root
    cfg.freeze()

    logger = setup_logger("PersonSearch", "", jax.process_index())

    # need_loaders=False: a replica boots from checkpoint + index alone —
    # no dataset/annotations on disk required
    model, state, _ = build_eval_state(
        cfg, checkpoint_file=args.checkpoint_file, dtype=compute_dtype(cfg),
        need_loaders=False,
    )
    index = RetrievalIndex(model, state, query_batch=args.query_batch,
                           quantize=args.quantize)
    index.load_index(args.index_file)
    logger.info("Index: %d rows x %d dims", index.gallery.shape[0],
                index.gallery.shape[1])

    if args.int8_text_calib:
        import numpy as _np

        calib = _np.load(args.int8_text_calib)
        ids, lens = calib["token_ids"], calib["lengths"]
        # fixed-shape calibration chunks: pad the caption length to the
        # service's query length so calibration sees the serving shapes
        max_len = cfg.INPUT.MAX_TEXT_LENGTH
        if ids.shape[1] < max_len:
            ids = _np.pad(ids, ((0, 0), (0, max_len - ids.shape[1])))
        ids = ids[:, :max_len]
        lens = _np.minimum(lens, max_len)
        bs = args.query_batch
        n_full = (len(ids) // bs) * bs or len(ids)
        chunks = [(ids[s:s + bs], lens[s:s + bs])
                  for s in range(0, n_full, bs)]
        index.enable_int8_text(chunks)
        logger.info("int8 text encode enabled (%d calibration captions)",
                    n_full)

    tokenizer = (SimpleTokenizer.from_file(args.vocab_file)
                 if args.vocab_file else None)
    window = (args.batch_window_ms if args.batch_window_ms == "auto"
              else float(args.batch_window_ms))
    service = RetrievalService(
        index, max_text_length=cfg.INPUT.MAX_TEXT_LENGTH,
        tokenizer=tokenizer, batch_window_ms=window,
        k_buckets=[int(b) for b in args.k_buckets.split(",")],
        reload_dir=args.reload_dir,
        image_shape=(cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH))

    # warm the jit caches before accepting traffic: first-query latency on
    # TPU is a compile (~seconds), not a search
    import numpy as np

    warm_ids = np.ones((1, cfg.INPUT.MAX_TEXT_LENGTH), np.int32)
    service.search({"token_ids": warm_ids.tolist(), "lengths": [1]})
    logger.info("Warmup done")

    server = make_server(service, host=args.host, port=args.port)
    logger.info("Serving on http://%s:%d", *server.server_address)

    # SIGTERM (load-balancer rotation, VM preemption): stop accepting,
    # drain in-flight requests, exit 0.  shutdown() must not be called
    # from the serve_forever thread itself (it blocks on the loop
    # exiting), so the handler hands it to a helper thread.
    import signal
    import threading

    def _graceful(signum, frame):
        logger.info("SIGTERM: draining in-flight requests and exiting")
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)

    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
        server.shutdown()
    server.server_close()  # joins in-flight handlers (block_on_close)
    logger.info("Drained; bye")


if __name__ == "__main__":
    main()
