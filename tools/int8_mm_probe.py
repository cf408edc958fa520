#!/usr/bin/env python
"""On-chip A/B probe: fused int8-matmul+requant kernels
(ops/int8_mm_pallas.py) vs the XLA composition, at the ViT-B/16 bs128
c_fc/FFN site shapes.

Context: the int8-dataflow ViT encode (29.0 ms) barely beats the bf16
fused-attention tower (28.7) because requant VPU traffic eats the int8
MXU win, and the standalone requant kernel LOSES in-graph (it breaks
XLA's surrounding fusions — quant_pallas.py verdict).  These kernels put
the requant inside the matmul custom call, where there is no fusion to
break.  This probe decides whether they become the tower default; the
gate for integration remains the ENCODE-level A/B (BENCH_STAGES), per
the round-5 lesson.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from textreid_tpu.models.int8_vit import (  # noqa: E402
    _quick_gelu,
    _requant_rowdyn,
)
from textreid_tpu.ops.int8_mm_pallas import (  # noqa: E402
    fused_int8_ffn,
    fused_int8_matmul_requant,
)

ROWS, K, N = 128 * 197, 768, 3072


def timed(fn, args, iters=50):
    """bench.py methodology: difference of two runtime trip counts of one
    compiled loop (fixed overhead cancels).  ``fn(*args) -> scalar``."""
    @jax.jit
    def loop(n, args):
        def body(_, c):
            a, carry = c
            # live dependency on the loop carry so the body can't hoist;
            # int8 input perturbed by a value XLA can't prove zero
            xp = (a[0].astype(jnp.int32)
                  + (carry * 1e-30).astype(jnp.int32)).astype(jnp.int8)
            carry = carry + fn(xp, *a[1:])
            return (a, carry)
        return jax.lax.fori_loop(0, n, body, (args, jnp.float32(0)))[1]

    float(loop(2, args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(iters, args))
    t1 = time.perf_counter()
    float(loop(iters // 2, args))
    t2 = time.perf_counter()
    return ((t1 - t0) - (t2 - t1)) / (iters - iters // 2)


def consume(*outs):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)


def xla_mm(xq, wq):
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return consume(y)


def xla_site(xq, wq, s_w, b, r_row, s_next, mid_dtype=jnp.bfloat16):
    """int8_vit c_fc composition: matmul -> decode at mid_dtype (the
    production tower emits bf16 here) -> quickGELU -> requant."""
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_w * r_row
    y = y.astype(mid_dtype) + b.astype(mid_dtype)
    q, r = _requant_rowdyn(_quick_gelu(y).astype(jnp.float32), s_next)
    return consume(q, r)


def xla_ffn(xq, w1, s_w1, b1, r_row, s_mid, w2, s_w2, b2,
            mid_dtype=jnp.bfloat16):
    y = jax.lax.dot_general(xq, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_w1 * r_row
    y = y.astype(mid_dtype) + b1.astype(mid_dtype)
    g, r = _requant_rowdyn(_quick_gelu(y).astype(jnp.float32), s_mid)
    z = jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = z.astype(jnp.float32) * s_w2 * r
    return consume(z.astype(mid_dtype) + b2.astype(mid_dtype))


def main():
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (ROWS, K)), jnp.int8)
    w1 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    w2 = jnp.asarray(rng.randint(-127, 128, (N, K)), jnp.int8)
    s_w1 = jnp.asarray((rng.rand(N) + 0.1) * 1e-3, jnp.float32)
    s_w2 = jnp.asarray((rng.rand(K) + 0.1) * 1e-3, jnp.float32)
    b1 = jnp.asarray(rng.randn(N) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(K) * 0.05, jnp.float32)
    r_row = jnp.asarray((rng.rand(ROWS, 1) + 0.05) / 127.0, jnp.float32)
    s_mid = jnp.asarray((rng.rand(N) + 0.05) / 127.0, jnp.float32)

    report = {}
    mm_flops = 2 * ROWS * K * N

    def rec(name, fn, args, flops):
        try:
            t = timed(fn, args)
            report[name + "_ms"] = round(t * 1e3, 3)
            report[name + "_tops"] = round(flops / t / 1e12, 1)
        except Exception as e:  # noqa: BLE001
            report[name + "_ms"] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith(name)}), flush=True)

    # floor: the bare int8 matmul (MXU rate reference at this shape)
    rec("mm_only", jax.jit(xla_mm), (xq, w1), mm_flops)

    # c_fc site: XLA composition (prod bf16 mid) vs fused kernel
    site_args = (xq, w1, s_w1, b1, r_row, s_mid)
    rec("site_xla", jax.jit(xla_site), site_args, mm_flops)
    for br in (256, 512):
        rec(f"site_kernel_br{br}",
            jax.jit(functools.partial(
                lambda *a, br=br: consume(*fused_int8_matmul_requant(
                    *a, op="gelu", block_rows=br)))),
            site_args, mm_flops)

    # whole FFN: XLA chain vs one kernel
    ffn_args = (xq, w1, s_w1, b1, r_row, s_mid, w2, s_w2, b2)
    rec("ffn_xla", jax.jit(xla_ffn), ffn_args, 2 * mm_flops)
    for br in (128, 256, 448):
        rec(f"ffn_kernel_br{br}",
            jax.jit(functools.partial(
                lambda *a, br=br: consume(fused_int8_ffn(
                    *a, out_dtype=jnp.bfloat16, block_rows=br)))),
            ffn_args, 2 * mm_flops)

    # on-chip exactness vs the f32-mid composition
    try:
        q_k, r_k = jax.jit(functools.partial(
            fused_int8_matmul_requant, op="gelu"))(*site_args)
        y = jax.lax.dot_general(xq, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s_w1 * r_row + b1
        q_x, r_x = _requant_rowdyn(_quick_gelu(y), s_mid)
        report["site_kernel_q_match"] = round(float(
            jnp.mean((q_k == q_x).astype(jnp.float32))), 5)
        report["site_kernel_r_maxrel"] = round(float(jnp.max(
            jnp.abs(r_k - r_x) / jnp.abs(r_x))), 7)
    except Exception as e:  # noqa: BLE001
        report["site_kernel_q_match"] = f"ERR {type(e).__name__}"
    print(json.dumps(report), flush=True)
    with open("/root/repo/WS/int8_mm_probe.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
