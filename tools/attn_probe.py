"""On-chip probe for the fused Pallas attention kernel.

Times the XLA formulation vs the Pallas kernel (forward and backward) at
the two production shapes — ViT-B/16 on 384x128 crops and the CLIP text
tower — across sample-block sizes, and cross-checks agreement on device.
Writes nothing; prints one line per measurement (tuning methodology tool,
same role as tools/topk_ladder.py for the top-k kernel).

Usage (real TPU):  python tools/attn_probe.py [--iters 100]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--blocks", type=int, nargs="*", default=[4, 8, 16, 32])
    ap.add_argument("--skip-bwd", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _timed_loop
    from textreid_tpu.ops.attention_pallas import (
        fused_attention, fused_attention_bwd, xla_attention)

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    for name, (batch, seq, heads, head_dim, causal) in [
        ("vit_b16[128,193,12,64]", (128, 193, 12, 64, False)),
        ("text[128,77,8,64]", (128, 77, 8, 64, True)),
    ]:
        width = heads * head_dim
        qkv = jax.device_put(
            jax.random.normal(key, (batch, seq, 3 * width), jnp.bfloat16))
        g = jax.device_put(
            jax.random.normal(key, (batch, seq, width), jnp.bfloat16))

        t = _timed_loop(functools.partial(xla_attention, heads=heads,
                                          causal=causal), (qkv,),
                        iters=args.iters)
        print(f"{name} fwd xla: {t*1e3:.3f} ms", flush=True)
        for layout in ("fused", "split", "pair"):
            for bb in args.blocks:
                f = functools.partial(fused_attention, heads=heads,
                                      causal=causal, block_batch=bb,
                                      layout=layout)
                try:
                    t = _timed_loop(f, (qkv,), iters=args.iters)
                except Exception as e:  # Mosaic lowering rejection etc.
                    print(f"{name} fwd {layout} bb={bb}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                    break
                print(f"{name} fwd {layout} bb={bb}: {t*1e3:.3f} ms",
                      flush=True)

        if not args.skip_bwd:
            def xla_bwd(qkv_, g_):
                _, vjp = jax.vjp(
                    lambda t_: xla_attention(t_, heads=heads, causal=causal),
                    qkv_)
                return vjp(g_)[0]

            t = _timed_loop(xla_bwd, (qkv, g), iters=args.iters)
            print(f"{name} bwd xla(vjp): {t*1e3:.3f} ms", flush=True)
            for layout in ("fused", "split", "pair"):
                for bb in args.blocks:
                    f = functools.partial(fused_attention_bwd, heads=heads,
                                          causal=causal, block_batch=bb,
                                          layout=layout)
                    try:
                        t = _timed_loop(f, (qkv, g), iters=args.iters)
                    except Exception as e:
                        print(f"{name} bwd {layout} bb={bb}: FAILED "
                              f"{type(e).__name__}: {str(e)[:160]}",
                              flush=True)
                        break
                    print(f"{name} bwd {layout} bb={bb}: {t*1e3:.3f} ms",
                          flush=True)

        # on-device agreement (compiled path, not interpret) per layout —
        # wrapped so a Mosaic rejection of one layout doesn't abort the
        # probe (the very scenario the other layout exists for)
        r = np.asarray(xla_attention(qkv, heads=heads, causal=causal),
                       np.float32)
        rb = None
        if not args.skip_bwd:
            rb = np.asarray(
                jax.vjp(lambda t_: xla_attention(t_, heads=heads,
                                                 causal=causal), qkv)[1](g)[0],
                np.float32)
        for layout in ("fused", "split", "pair"):
            try:
                o = np.asarray(fused_attention(qkv, heads=heads,
                                               causal=causal, layout=layout),
                               np.float32)
                cos = (r * o).sum() / (np.linalg.norm(r)
                                       * np.linalg.norm(o) + 1e-12)
                print(f"{name} fwd {layout} max_err={np.abs(r-o).max():.4e} "
                      f"cos={cos:.6f}", flush=True)
            except Exception as e:
                print(f"{name} fwd {layout} agreement: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            if rb is None:
                continue
            try:
                ob = np.asarray(
                    fused_attention_bwd(qkv, g, heads=heads, causal=causal,
                                        layout=layout), np.float32)
                cos = (rb * ob).sum() / (np.linalg.norm(rb)
                                         * np.linalg.norm(ob) + 1e-12)
                print(f"{name} bwd {layout} "
                      f"max_err={np.abs(rb-ob).max():.4e} cos={cos:.6f}",
                      flush=True)
            except Exception as e:
                print(f"{name} bwd {layout} agreement: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
