#!/usr/bin/env python
"""Capture and summarize a jax.profiler trace of the flagship train step.

The per-stage answer VERDICT round 1 asked for — and the tool the round-2
trace came from: device ops grouped by HLO category with per-step times,
so regressions in conv efficiency / BN-stat fusions / scan latency are
visible without a TensorBoard UI.  Works through the axon relay (the trace
files come back over the wire).

Usage: python tools/profile_step.py [--steps 3] [--out /tmp/jaxtrace]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_step():
    import jax
    import jax.numpy as jnp

    from textreid_tpu.config import get_default_cfg
    from textreid_tpu.engine import create_train_state, make_train_step
    from textreid_tpu.models import build_model
    from textreid_tpu.solver import make_optimizer
    from textreid_tpu.solver.build import set_learning_rate

    cfg = get_default_cfg()
    cfg.TPU.ALLOW_RANDOM_VOCAB = True
    cfg.MODEL.VISUAL_MODEL = "m_resnet50"
    cfg.MODEL.TEXTUAL_MODEL = "bigru"
    cfg.MODEL.GRU.ONEHOT = "clip_vit"
    cfg.MODEL.GRU.VOCABULARY_SIZE = 512
    cfg.MODEL.RESNET.RES5_STRIDE = 1
    cfg.MODEL.EMBEDDING.EMBED_HEAD = "moco"
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = 256
    cfg.MODEL.MOCO.FC = False
    cfg.MODEL.MOCO.K = 2048
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 384, 128

    batch_size, tokens = 128, 105
    model = build_model(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {
        "pixels": rng.randint(0, 255, (batch_size, 384, 128, 3),
                              dtype=np.uint8),
        "erase": np.zeros((batch_size, 5), np.int32),
        "token_ids": rng.randint(1, 512, (batch_size, tokens)).astype(np.int32),
        "lengths": rng.randint(10, tokens, (batch_size,)).astype(np.int32),
        "pids": rng.randint(0, 11003, (batch_size,)).astype(np.int32),
    }
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
        jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
        method="init_all"))()
    jax.block_until_ready(variables)
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-4))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    db = {k: jax.device_put(v) for k, v in batch.items()}
    return step, state, db


def summarize(trace_dir: str, steps: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    skip = re.compile(r"\$|^jit_|^PjitFunction|^np\.asarray|^\d+$|^trace|^program")
    by_cat = collections.Counter()
    for e in events:
        name = e.get("name", "")
        if skip.search(name):
            continue
        cat = e.get("args", {}).get("hlo_category", "uncategorized")
        by_cat[cat] += e.get("dur", 0) / 1e3
    total = sum(by_cat.values())
    print(f"device-op total: {total:.1f} ms over {steps} steps "
          f"-> {total / steps:.1f} ms/step")
    for cat, ms in by_cat.most_common():
        print(f"{ms / steps:9.2f} ms/step  {cat}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--out", default="/tmp/jaxtrace")
    args = parser.parse_args()

    import jax

    step, state, db = build_step()
    state, m = step(state, db)  # compile outside the trace
    float(m["loss"])
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, db)
        float(m["loss"])
    summarize(args.out, args.steps)


if __name__ == "__main__":
    main()
