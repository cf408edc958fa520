"""Pallas TPU kernel: fused (LayerNorm | GELU) + two-level int8 requant.

The int8-dataflow towers (`models/int8_vit.py`, `models/int8_text.py`)
sandwich every block matmul between requantization passes: normalize (or
GELU), scale by the calibrated per-channel reciprocal, take a per-token
row-max, round to int8.  Composed from XLA ops the row-max is a
reduction over the SAME tensor the quantize then re-reads — XLA cannot
fuse a reduce with an elementwise consumer of its input into one pass,
so the activation crosses HBM one extra time per site (it *recomputes*
the normalize into both consumers, so the extra cost is one read, not a
full normalize pass — see the verdict below; this kernel was built on
the larger estimate and the step-level A/B proved the estimate wrong).

This kernel does the whole site in ONE read: a row tile lives in VMEM,
the optional LayerNorm statistics / quickGELU, the per-channel scaling,
the row-max and the round all happen on-chip, and the only HBM writes are
the int8 tensor (4x smaller than the f32 it replaces) and one scale per
row.  Rows are independent, so the grid tiles rows only and the ragged
tail block is harmless (pad rows produce garbage that is never written
back).

Measured verdict — **default OFF** (a negative result, kept with its
measurements like ``ops/gru_pallas.py``'s keep-XLA default):

* Isolated-op probe (on-chip, ViT-B/16 bs128 site shapes —
  ``tools/requant_probe.py``): op="ln" [25216, 768] 0.112 ms vs XLA
  0.312 (2.8x) at block_rows=1024 + row-major scale layout; op="none"
  parity (0.119 vs 0.135); op="gelu" LOSES (1.25 vs 0.508 — f32
  sigmoid at half the VPU rate of XLA's bf16 epilogue-fused GELU; the
  bf16-compute variant fails Mosaic verification).
* **Encode-level A/B (the number that matters): the kernel loses
  everywhere.** ViT-B/16 bs128 int8-dataflow encode: 29.0 ms pure-XLA,
  32.4 ms with the kernel at the two LN sites per block, 56.8 ms at
  every site; text transformer 9.2 -> 9.9 / 17.0 ms.  The probe's
  standalone XLA composition overstated the opportunity: in the real
  graph XLA recomputes the cheap normalize into both the row-max
  reduction and the quantize fusions, so composed requant costs one
  extra HBM *read* of the activation, not a full extra pass — and the
  custom-call boundary (layout pins, lost fusion with the surrounding
  int8-matmul epilogues) costs more than that read saves.

``models/int8_vit._prequant`` therefore keeps the XLA composition;
``TEXTREID_FUSED_REQUANT=1`` re-enables the kernel at LN sites for
re-probing on future hardware/compilers.

Scale output rides as ``[1, rows]`` (rows on lanes): a ``[rows, 1]``
block puts one scale per 128-lane vector register — measured ~1.4x
slower at the ln site (k1024 0.154 vs k1024_row 0.112).

Semantics contract (tested in interpret mode against the XLA
composition): identical to ``int8_vit._requant_rowdyn`` applied to
``_norm_no_affine(x)`` (op="ln"), ``quick_gelu(x)`` in f32 (op="gelu"),
or ``x`` (op="none") — same eps, same round-half-away-from-zero, same
1e-6 row-scale floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OPS = ("none", "ln", "gelu")


def requant_eligible(x) -> bool:
    """The kernel wants whole rows in one block: lane-aligned channels.
    (All production widths qualify: 512/768/2048/3072; the tiny test
    towers' width 32 falls back to the XLA composition.)"""
    return x.shape[-1] % 128 == 0


def _requant_kernel(x_ref, s_ref, q_ref, r_ref, *, op: str, eps: float):
    x = x_ref[:].astype(jnp.float32)
    if op == "ln":
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + eps)
    elif op == "gelu":
        x = x * jax.nn.sigmoid(1.702 * x)
    xn = x * jax.lax.reciprocal(s_ref[:].astype(jnp.float32))
    r = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True),
                    1e-6) * (1.0 / 127.0)
    v = xn * jax.lax.reciprocal(r)
    # round-half-away via +-0.5-and-truncate (int8_vit._requant_rowdyn)
    v = v + jnp.where(v >= 0, 0.5, -0.5)
    q_ref[:] = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)
    r_ref[:] = r.reshape(1, -1)  # scales on lanes (see module docstring)


# f32 row-tile VMEM budget for auto block sizing: ~6 MB of the 16 MB
# core budget leaves room for the bf16 input copy, the int8 output and
# double buffering (block_rows=1024 at C=768 measured fastest; C=3072
# at 1024 rows OOMs the core).
_VMEM_F32_BUDGET = 6 * 1024 * 1024


def fused_requant(x, s_ci, op: str = "none", eps: float = 1e-5,
                  block_rows: int = 0, interpret: bool = False):
    """``x [..., C] float, s_ci [C] f32 -> (int8 [..., C], f32 [..., 1])``.

    One-HBM-pass (optional LN/GELU) + two-level requant; see module
    docstring.  ``op``: "none" | "ln" (unscaled LayerNorm first) |
    "gelu" (quickGELU in f32 first).  ``block_rows=0`` auto-sizes the
    row tile to the VMEM budget."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}; got {op!r}")
    if not requant_eligible(x):
        raise ValueError(
            f"last dim {x.shape[-1]} is not lane-aligned (128); use the "
            f"XLA composition instead (requant_eligible() gates this)")
    lead = x.shape[:-1]
    c = x.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(rows, c)
    s2 = jnp.asarray(s_ci, jnp.float32).reshape(1, c)
    if not block_rows:
        block_rows = max(256, min(1024, _VMEM_F32_BUDGET // (4 * c)))
    br = min(block_rows, max(32, rows))  # int8 sublane is 32

    q, r = pl.pallas_call(
        functools.partial(_requant_kernel, op=op, eps=eps),
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, br), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), jnp.int8),
            jax.ShapeDtypeStruct((1, rows), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, s2)
    return (q.reshape(lead + (c,)),
            r.reshape((rows,)).reshape(lead + (1,)))
