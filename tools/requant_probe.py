#!/usr/bin/env python
"""On-chip A/B probe for the fused requant kernel (ops/quant_pallas.py)
vs the XLA composition it replaces, at the exact int8-ViT site shapes.

Round-5 context: the first kernel landing REGRESSED the towers (ViT int8
29.0 -> 56.8 ms) — this probe names where the time goes and evaluates
layout/tiling variants before the next integration attempt.
"""

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from textreid_tpu.models.int8_vit import (  # noqa: E402
    _norm_no_affine,
    _quick_gelu,
    _requant_rowdyn,
)
from textreid_tpu.ops.quant_pallas import fused_requant  # noqa: E402


def timed(fn, args, iters=100):
    """Difference of two runtime trip counts of one compiled loop (the
    bench.py methodology, minus the perturbation machinery — these
    operands are fresh per call)."""
    @jax.jit
    def loop(n, args):
        def body(_, c):
            a, carry = c
            # live input dependency (not provably zero -> no hoisting)
            # and full-output consumption (cheap int8 read -> no DCE or
            # slice-narrowing of the quantize pass)
            xp = a[0] + (carry * 1e-30).astype(a[0].dtype)
            q, r = fn(xp, *a[1:])
            carry = (carry + jnp.sum(q, dtype=jnp.int32).astype(jnp.float32)
                     + jnp.sum(r.astype(jnp.float32)))
            return (a, carry)
        return jax.lax.fori_loop(0, n, body, (args, jnp.float32(0)))[1]

    import time

    float(loop(2, args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(iters, args))
    t1 = time.perf_counter()
    float(loop(iters // 2, args))
    t2 = time.perf_counter()
    return ((t1 - t0) - (t2 - t1)) / (iters - iters // 2)


def xla_ref(x, s, op):
    xf = x.astype(jnp.float32)
    if op == "ln":
        xf = _norm_no_affine(x)
    elif op == "gelu":
        xf = _quick_gelu(x).astype(jnp.float32)  # gelu at input dtype
    return _requant_rowdyn(xf, s)


def kernel_variant(x, s, op, block_rows=256, scale_layout="col",
                   compute_dtype="f32"):
    """Parameterized re-implementation for the probe."""
    rows, c = x.shape
    s = jnp.asarray(s, jnp.float32).reshape(1, c)

    def _kernel(x_ref, s_ref, q_ref, r_ref):
        if compute_dtype == "f32":
            xx = x_ref[:].astype(jnp.float32)
        else:
            xx = x_ref[:]
        if op == "ln":
            xf = xx.astype(jnp.float32)
            mean = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
            xx = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        elif op == "gelu":
            xx = xx * jax.nn.sigmoid(1.702 * xx)
        xn = xx.astype(jnp.float32) * jax.lax.reciprocal(
            s_ref[:].astype(jnp.float32))
        r = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True),
                        1e-6) * (1.0 / 127.0)
        v = xn * jax.lax.reciprocal(r)
        v = v + jnp.where(v >= 0, 0.5, -0.5)
        q_ref[:] = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
        if scale_layout == "col":
            r_ref[:] = r
        else:
            r_ref[:] = r.reshape(1, -1)

    br = block_rows
    if scale_layout == "col":
        r_spec = pl.BlockSpec((br, 1), lambda i: (i, 0))
        r_shape = jax.ShapeDtypeStruct((rows, 1), jnp.float32)
    else:
        r_spec = pl.BlockSpec((1, br), lambda i: (0, i))
        r_shape = jax.ShapeDtypeStruct((1, rows), jnp.float32)

    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)), r_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, c), jnp.int8), r_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, s)


def main():
    rng = np.random.RandomState(0)
    report = {}
    # ViT-B/16 bs128 site shapes (rows = 128*197)
    sites = [
        ("ln_w", 25216, 768, "ln"),       # qkv / c_fc input
        ("none_w", 25216, 768, "none"),   # attention output
        ("gelu_4w", 25216, 3072, "gelu"),  # c_fc output
    ]
    for name, rows, c, op in sites:
        x = jnp.asarray(rng.randn(rows, c).astype(np.float32) * 1.3,
                        jnp.bfloat16)
        s = jnp.asarray((rng.rand(c) + 0.05).astype(np.float32) / 127.0)

        t = timed(jax.jit(functools.partial(xla_ref, op=op)), (x, s))
        report[f"{name}_xla_ms"] = round(t * 1e3, 3)

        for label, kw in [
            ("k256", dict(block_rows=256)),
            ("k256_row", dict(block_rows=256, scale_layout="row")),
            ("k1024", dict(block_rows=1024)),
            ("k1024_row", dict(block_rows=1024, scale_layout="row")),
            ("k256_bf16", dict(block_rows=256, compute_dtype="in")),
        ]:
            try:
                fn = jax.jit(functools.partial(kernel_variant, op=op, **kw))
                t = timed(fn, (x, s))
                report[f"{name}_{label}_ms"] = round(t * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                report[f"{name}_{label}_ms"] = f"ERR {type(e).__name__}"
        print(json.dumps({k: v for k, v in report.items()
                          if k.startswith(name)}), flush=True)
    with open("/root/repo/WS/requant_probe.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
