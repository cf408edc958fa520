"""Pallas TPU kernel: int8 matmul with a fused (GELU +) requant epilogue.

Motivation (the gap `ops/quant_pallas.py` could not close): the
int8-dataflow ViT (`models/int8_vit.py`) encodes at 29.0 ms — only 1.01x
the bf16 fused-attention tower — because the requant sandwiches between
the int8 matmuls are pure-VPU HBM traffic that eats the int8 MXU's 1.8x
MAC-rate win.  A standalone requant kernel LOSES step-level (it breaks
XLA's epilogue fusions around it; measurements in quant_pallas.py).  The
only placement that cannot lose a fusion is *inside the matmul itself*:
this kernel computes the int8xint8->int32 product on the MXU and runs the
whole decode -> (quickGELU) -> per-channel scale -> per-token row-max ->
int8 round epilogue on the output tile while it is still in VMEM.  At the
ViT-B/16 c_fc site the [25216, 3072] activation then never exists in HBM
at the tower dtype: HBM sees int8 in (19 MB), int8 out (77 MB), where the
composed XLA graph writes + re-reads the bf16 tensor (2x155 MB) around
the requant reduction.

Layout: grid tiles rows only.  The full [K, N] int8 weight is one block
revisited every grid step (Mosaic keeps it resident in VMEM — 2.25 MB at
the c_fc shape), and each [br, N] f32 output tile lives entirely in VMEM
so the row-max needs no cross-tile reduction.  This caps N: N*4 bytes/row
x br plus the weight must fit the ~16 MB core budget — fine for every
site of ViT-B/16 / CLIP text (N <= 3072), checked by ``fused_eligible``.

Semantics contract (tested interpret-mode): identical to
``int8_vit._int8_matmul(site, xq, r_row, out_dtype=f32)`` followed by
``_prequant(., s_next, "gelu"|"none")`` — same f32 decode, same
round-half-away-from-zero, same 1e-6 row-scale floor.  (The production
bf16 tower rounds the matmul output to bf16 before the GELU; this kernel
keeps it in f32 — strictly tighter numerics on a path already covered by
calibration tolerances.)

Measured verdict (v5e, two runs of `tools/int8_ffn_ab.py` each, plus the
op-level `tools/int8_mm_probe.py`): the per-site kernel LOSES standalone
(0.89 vs XLA 0.675 ms at the c_fc shape — Mosaic's s8 epilogue is slower
than XLA's fused one); the whole-FFN kernel wins the op probe slightly
(0.897 vs 0.935 ms at block_rows=128) and at ENCODE level wins on the
text tower (8.61→8.08 / 8.66→8.28 ms bs128×T105) while a wash on the
ViT (27.30→27.10 / 27.24→27.27 ms).  Shipped per-tower: default ON for
text, OFF for ViT (`int8_vit._fused_ffn_wanted`;
``TEXTREID_FUSED_INT8_FFN=on|off`` forces both).  The per-site variant
stays available for probing only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OPS = ("none", "gelu")

# f32 output tile + int8 weight VMEM budget (of the ~16 MB core budget;
# leaves room for the int8 x block, int8 output and double buffering).
_VMEM_BUDGET = 10 * 1024 * 1024


def fused_eligible(m: int, k: int, n: int) -> bool:
    """Whole output rows must fit VMEM next to the resident weight, and
    every dimension must be lane/sublane-tileable."""
    if n % 128 or k % 128:
        return False
    weight = k * n  # int8 bytes, resident
    row = 4 * n  # one f32 output row
    return weight + 32 * row <= _VMEM_BUDGET  # br >= 32 (int8 sublane)


def ffn_eligible(k: int, n: int, m_out: int) -> bool:
    """`fused_int8_ffn` keeps BOTH weights and a [br, n] f32 tile in
    VMEM; all three dims must be lane-aligned."""
    if n % 128 or k % 128 or m_out % 128:
        return False
    return k * n + n * m_out + 32 * 4 * n <= _VMEM_BUDGET


def _kernel(x_ref, w_ref, sw_ref, b_ref, rrow_ref, snext_ref,
            q_ref, r_ref, *, op: str):
    y = lax.dot_general(x_ref[:], w_ref[:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sw_ref[:].astype(jnp.float32)
    y = y * rrow_ref[:].astype(jnp.float32)  # [br, 1] broadcast
    y = y + b_ref[:].astype(jnp.float32)
    if op == "gelu":
        y = y * jax.nn.sigmoid(1.702 * y)
    xn = y * lax.reciprocal(snext_ref[:].astype(jnp.float32))
    r = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True),
                    1e-6) * (1.0 / 127.0)
    v = xn * lax.reciprocal(r)
    v = v + jnp.where(v >= 0, 0.5, -0.5)  # round-half-away (int8_vit)
    q_ref[:] = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
    r_ref[:] = r.reshape(1, -1)  # scales on lanes (quant_pallas layout)


def fused_int8_matmul_requant(xq, w_q, s_w, b, r_row, s_next,
                              op: str = "gelu", block_rows: int = 0,
                              interpret: bool = False):
    """``xq [..., K] i8 @ w_q [K, N] i8`` -> epilogue -> next int8 input.

    Args mirror one `int8_vit` site: ``s_w [N]`` f32 weight decode scale,
    ``b [N]`` bias, ``r_row [..., 1]`` f32 the input's dynamic row scale,
    ``s_next [N]`` the *consumer* site's calibrated per-channel scale.
    Returns ``(int8 [..., N], f32 [..., 1])`` exactly like
    ``int8_vit._prequant``.
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}; got {op!r}")
    lead = xq.shape[:-1]
    k = xq.shape[-1]
    n = w_q.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    if not fused_eligible(rows, k, n):
        raise ValueError(
            f"site ({rows},{k},{n}) not eligible: needs lane-aligned K/N "
            f"and K*N + 128*N*4 <= {_VMEM_BUDGET} (fused_eligible gates "
            f"this)")
    x2 = xq.reshape(rows, k)
    r2 = jnp.asarray(r_row, jnp.float32).reshape(rows, 1)
    if not block_rows:
        block_rows = max(32, min(
            512, (_VMEM_BUDGET - k * n) // (4 * n) // 32 * 32))
    br = min(block_rows, max(32, rows))

    q, r = pl.pallas_call(
        functools.partial(_kernel, op=op),
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, n), lambda i: (i, 0)),
            pl.BlockSpec((1, br), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, n), jnp.int8),
            jax.ShapeDtypeStruct((1, rows), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * k * n,
            transcendentals=rows * n if op == "gelu" else 0,
            bytes_accessed=rows * k + k * n + rows * n + 16 * n + 8 * rows,
        ),
        interpret=interpret,
    )(x2, jnp.asarray(w_q, jnp.int8),
      jnp.asarray(s_w, jnp.float32).reshape(1, n),
      jnp.asarray(b, jnp.float32).reshape(1, n),
      r2, jnp.asarray(s_next, jnp.float32).reshape(1, n))
    return (q.reshape(lead + (n,)),
            r.reshape((rows,)).reshape(lead + (1,)))


def _ffn_kernel(x_ref, w1_ref, sw1_ref, b1_ref, rrow_ref, smid_ref,
                w2_ref, sw2_ref, b2_ref, y_ref, *, out_dtype):
    y = lax.dot_general(x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
    y = y * rrow_ref[:].astype(jnp.float32)
    y = y + b1_ref[:].astype(jnp.float32)
    y = y * jax.nn.sigmoid(1.702 * y)  # quickGELU
    xn = y * lax.reciprocal(smid_ref[:].astype(jnp.float32))
    r = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True),
                    1e-6) * (1.0 / 127.0)
    v = xn * lax.reciprocal(r)
    v = v + jnp.where(v >= 0, 0.5, -0.5)
    g = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
    z = lax.dot_general(g, w2_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    z = z.astype(jnp.float32) * sw2_ref[:].astype(jnp.float32)
    z = z * r
    y_ref[:] = (z.astype(out_dtype)
                + b2_ref[:].astype(out_dtype))


def fused_int8_ffn(xq, w1_q, s_w1, b1, r_row, s_mid, w2_q, s_w2, b2,
                   out_dtype=jnp.float32, block_rows: int = 0,
                   interpret: bool = False):
    """The whole int8 FFN in one kernel: ``c_fc`` matmul -> decode ->
    quickGELU -> requant (per-token dynamic scale) -> ``c_proj`` matmul
    -> decode, all while the [br, 4W] tile sits in VMEM.  The wide
    intermediate never touches HBM in ANY dtype.  Returns the f32/bf16
    ``c_proj`` output (the residual add stays in XLA).

    Semantics: `_int8_matmul(c_fc) -> _prequant(gelu) ->
    _int8_matmul(c_proj)` of `models/int8_vit.int8_block_apply`, with
    the intermediate in f32 instead of the tower dtype."""
    lead = xq.shape[:-1]
    k = xq.shape[-1]
    n = w1_q.shape[-1]
    m_out = w2_q.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    if not ffn_eligible(k, n, m_out):
        raise ValueError(
            f"FFN site ({k},{n},{m_out}) not eligible: needs lane-aligned "
            f"dims and both weights + a 32-row f32 tile within "
            f"{_VMEM_BUDGET} VMEM bytes (ffn_eligible gates this)")
    x2 = xq.reshape(rows, k)
    r2 = jnp.asarray(r_row, jnp.float32).reshape(rows, 1)
    if not block_rows:
        avail = _VMEM_BUDGET - (k * n + n * m_out)
        block_rows = max(32, min(512, avail // (4 * n) // 32 * 32))
    br = min(block_rows, max(32, rows))

    y = pl.pallas_call(
        functools.partial(_ffn_kernel, out_dtype=out_dtype),
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((n, m_out), lambda i: (0, 0)),
            pl.BlockSpec((1, m_out), lambda i: (0, 0)),
            pl.BlockSpec((1, m_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, m_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, m_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * n * (k + m_out),
            transcendentals=rows * n,
            bytes_accessed=(rows * k + k * n + n * m_out
                            + rows * m_out * (2 if out_dtype == jnp.bfloat16
                                              else 4)),
        ),
        interpret=interpret,
    )(x2, jnp.asarray(w1_q, jnp.int8),
      jnp.asarray(s_w1, jnp.float32).reshape(1, n),
      jnp.asarray(b1, jnp.float32).reshape(1, n),
      r2, jnp.asarray(s_mid, jnp.float32).reshape(1, n),
      jnp.asarray(w2_q, jnp.int8),
      jnp.asarray(s_w2, jnp.float32).reshape(1, m_out),
      jnp.asarray(b2, jnp.float32).reshape(1, m_out))
    return y.reshape(lead + (m_out,))
