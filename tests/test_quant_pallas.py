"""Fused (LN | GELU) + two-level requant kernel (ops/quant_pallas.py):
interpret-mode agreement with the XLA composition it replaces
(int8_vit._requant_rowdyn over _norm_no_affine / quick-GELU / identity),
ragged row tails, shape preservation, and the eligibility gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.models.int8_vit import (
    _norm_no_affine,
    _quick_gelu,
    _requant_rowdyn,
)
from textreid_tpu.ops.quant_pallas import fused_requant, requant_eligible


def _reference(x, s, op):
    x = jnp.asarray(x, jnp.float32)
    if op == "ln":
        x = _norm_no_affine(x)
    elif op == "gelu":
        x = _quick_gelu(x)
    return _requant_rowdyn(x, jnp.asarray(s, jnp.float32))


def _case(rows, c, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(rows, c).astype(np.float32) * 1.7
    s = (rng.rand(c).astype(np.float32) + 0.05) / 127.0
    return jnp.asarray(x), jnp.asarray(s)


@pytest.mark.parametrize("op", ["none", "ln", "gelu"])
def test_matches_xla_composition(op):
    x, s = _case(64, 256, seed=hash(op) % 100)
    want_q, want_r = _reference(x, s, op)
    got_q, got_r = fused_requant(x, s, op=op, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-6)


def test_ragged_row_tail():
    """rows not divisible by the block: the tail block's pad rows must
    not corrupt real rows (rows are independent by construction)."""
    x, s = _case(100, 128, seed=3)
    want_q, want_r = _reference(x, s, "ln")
    got_q, got_r = fused_requant(x, s, op="ln", block_rows=32,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-6)


def test_preserves_leading_shape():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 7, 256).astype(np.float32))
    s = jnp.asarray((rng.rand(256).astype(np.float32) + 0.1) / 127.0)
    q, r = fused_requant(x, s, op="none", interpret=True)
    assert q.shape == (4, 7, 256) and q.dtype == jnp.int8
    assert r.shape == (4, 7, 1) and r.dtype == jnp.float32
    want_q, want_r = _reference(x.reshape(-1, 256), s, "none")
    np.testing.assert_array_equal(np.asarray(q).reshape(-1, 256),
                                  np.asarray(want_q))


def test_bf16_input_matches_f32_cast():
    """bf16 activations (the production residual stream) are decoded to
    f32 before the statistics — same contract as the XLA composition."""
    x, s = _case(32, 128, seed=7)
    xb = x.astype(jnp.bfloat16)
    want_q, want_r = _reference(xb, s, "ln")
    got_q, got_r = fused_requant(xb, s, op="ln", interpret=True)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-6)


def test_eligibility_gate():
    x, s = _case(8, 96)  # 96 not lane-aligned
    assert not requant_eligible(x)
    with pytest.raises(ValueError, match="lane-aligned"):
        fused_requant(x, s, interpret=True)
    with pytest.raises(ValueError, match="op must be"):
        fused_requant(*_case(8, 128), op="sigmoid", interpret=True)
