#!/usr/bin/env python
"""Encode-level A/B for the fused int8-FFN Pallas kernel
(ops/int8_mm_pallas.py) on the int8-dataflow towers — the integration
gate.  The quant_pallas round-5 lesson: isolated-op probe wins do NOT
transfer to graph level; only this A/B can flip the default.

Runs the exact BENCH_STAGES tower constructions (ViT-B/16 at 384x128
bs128; CLIP text at bs128xT=105) and times `int8_*_apply` with
fused_ffn=False vs True, plus an on-chip embedding agreement check.
Writes WS/int8_ffn_ab.json.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _timed_loop  # noqa: E402
from textreid_tpu.models.int8_text import (  # noqa: E402
    calibrate_text_amax,
    int8_text_apply,
    prepare_int8_text,
)
from textreid_tpu.models.int8_vit import (  # noqa: E402
    calibrate_vit_amax,
    int8_vit_apply,
    prepare_int8_vit,
)
from textreid_tpu.models.text_transformer import TextTransformer  # noqa: E402
from textreid_tpu.models.vit import VisionTransformer  # noqa: E402

BATCH, TOKENS = 128, 105


def main():
    rng = np.random.RandomState(0)
    report = {}

    # --- ViT-B/16 ---
    vit = VisionTransformer(input_resolution=(384, 128), patch_size=16,
                            width=768, layers=12, heads=12, output_dim=512,
                            dtype=jnp.bfloat16)
    pixels = jnp.asarray(rng.rand(BATCH, 384, 128, 3), jnp.float32)
    vvars = jax.jit(lambda: vit.init(jax.random.PRNGKey(0), pixels))()
    jax.block_until_ready(vvars)
    amax = calibrate_vit_amax(vit, vvars["params"], [pixels],
                              (0.5,) * 3, (0.25,) * 3)
    tower = jax.device_put(prepare_int8_vit(vit, vvars["params"], amax))
    jax.block_until_ready(tower)

    def enc_off(t, x):
        return int8_vit_apply(vit, t, x, fused_ffn=False)

    def enc_on(t, x):
        return int8_vit_apply(vit, t, x, fused_ffn=True)

    for name, fn in [("vit_ffn_off", enc_off), ("vit_ffn_on", enc_on)]:
        try:
            t = _timed_loop(fn, (tower, pixels), iters=50, no_perturb=(0,))
            report[f"{name}_ms"] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_ms"] = f"ERR {type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith(name)}), flush=True)

    try:
        a = np.asarray(jax.jit(enc_off)(tower, pixels), np.float32)
        b = np.asarray(jax.jit(enc_on)(tower, pixels), np.float32)
        cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                                * np.linalg.norm(b, axis=1) + 1e-12)
        report["vit_ffn_min_cosine"] = round(float(cos.min()), 6)
    except Exception as e:  # noqa: BLE001
        report["vit_ffn_min_cosine"] = f"ERR {type(e).__name__}"
    print(json.dumps(report), flush=True)

    # --- CLIP text transformer ---
    txf = TextTransformer(vocab_size=49408, context_length=TOKENS,
                          width=512, layers=12, heads=8, output_dim=512,
                          dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.randint(1, 49408, (BATCH, TOKENS)), jnp.int32)
    lens = jnp.asarray(rng.randint(10, TOKENS, (BATCH,)), jnp.int32)
    tvars = jax.jit(lambda: txf.init(jax.random.PRNGKey(0), ids, lens))()
    jax.block_until_ready(tvars)
    tamax = calibrate_text_amax(txf, tvars["params"], [(ids, lens)])
    ttower = jax.device_put(prepare_int8_text(txf, tvars["params"], tamax))
    jax.block_until_ready(ttower)

    def tenc_off(t, i, l):
        return int8_text_apply(txf, t, i, l, fused_ffn=False)

    def tenc_on(t, i, l):
        return int8_text_apply(txf, t, i, l, fused_ffn=True)

    for name, fn in [("text_ffn_off", tenc_off), ("text_ffn_on", tenc_on)]:
        try:
            t = _timed_loop(fn, (ttower, ids, lens), iters=50,
                            no_perturb=(0,))
            report[f"{name}_ms"] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_ms"] = f"ERR {type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith(name)}), flush=True)

    with open("/root/repo/WS/int8_ffn_ab.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
