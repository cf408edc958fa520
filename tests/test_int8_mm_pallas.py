"""Fused int8-matmul + requant-epilogue kernels (ops/int8_mm_pallas.py):
interpret-mode agreement with the int8_vit XLA composition they replace,
ragged tails, and eligibility gates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.models.int8_vit import _quick_gelu, _requant_rowdyn
from textreid_tpu.ops.int8_mm_pallas import (
    ffn_eligible,
    fused_eligible,
    fused_int8_ffn,
    fused_int8_matmul_requant,
)


def _site(rows, k, n, seed=0):
    rng = np.random.RandomState(seed)
    xq = rng.randint(-127, 128, (rows, k)).astype(np.int8)
    wq = rng.randint(-127, 128, (k, n)).astype(np.int8)
    s_w = (rng.rand(n).astype(np.float32) + 0.1) * 1e-3
    b = rng.randn(n).astype(np.float32) * 0.05
    r_row = (rng.rand(rows, 1).astype(np.float32) + 0.05) / 127.0
    s_next = (rng.rand(n).astype(np.float32) + 0.05) / 127.0
    return xq, wq, s_w, b, r_row, s_next


def _xla_site(xq, wq, s_w, b, r_row, s_next, op):
    y = jax.lax.dot_general(jnp.asarray(xq), jnp.asarray(wq),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_w * r_row + b
    if op == "gelu":
        y = _quick_gelu(y)
    return _requant_rowdyn(y, jnp.asarray(s_next))


@pytest.mark.parametrize("op", ["none", "gelu"])
def test_matmul_requant_matches_composition(op):
    xq, wq, s_w, b, r_row, s_next = _site(64, 128, 256,
                                          seed=hash(op) % 50)
    want_q, want_r = _xla_site(xq, wq, s_w, b, r_row, s_next, op)
    got_q, got_r = fused_int8_matmul_requant(
        jnp.asarray(xq), wq, s_w, b, r_row, s_next, op=op,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-6)


def test_matmul_requant_ragged_rows():
    xq, wq, s_w, b, r_row, s_next = _site(100, 128, 128, seed=3)
    want_q, want_r = _xla_site(xq, wq, s_w, b, r_row, s_next, "gelu")
    got_q, got_r = fused_int8_matmul_requant(
        jnp.asarray(xq), wq, s_w, b, r_row, s_next, op="gelu",
        block_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-6)


def test_ffn_matches_composition():
    rows, k, n = 70, 128, 256
    xq, w1, s_w1, b1, r_row, s_mid = _site(rows, k, n, seed=11)
    rng = np.random.RandomState(12)
    w2 = rng.randint(-127, 128, (n, k)).astype(np.int8)
    s_w2 = (rng.rand(k).astype(np.float32) + 0.1) * 1e-3
    b2 = rng.randn(k).astype(np.float32) * 0.05

    g, r = _xla_site(xq, w1, s_w1, b1, r_row, s_mid, "gelu")
    z = jax.lax.dot_general(g, jnp.asarray(w2), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    want = z.astype(jnp.float32) * s_w2 * r + b2

    got = fused_int8_ffn(jnp.asarray(xq), w1, s_w1, b1, r_row, s_mid,
                         w2, s_w2, b2, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_ffn_bf16_output():
    rows, k, n = 40, 128, 128
    xq, w1, s_w1, b1, r_row, s_mid = _site(rows, k, n, seed=21)
    rng = np.random.RandomState(22)
    w2 = rng.randint(-127, 128, (n, k)).astype(np.int8)
    s_w2 = (rng.rand(k).astype(np.float32) + 0.1) * 1e-3
    b2 = rng.randn(k).astype(np.float32) * 0.05
    got = fused_int8_ffn(jnp.asarray(xq), w1, s_w1, b1, r_row, s_mid,
                         w2, s_w2, b2, out_dtype=jnp.bfloat16,
                         interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (rows, k)


def test_preserves_leading_shape():
    xq, wq, s_w, b, r_row, s_next = _site(6 * 8, 128, 128, seed=31)
    q, r = fused_int8_matmul_requant(
        jnp.asarray(xq).reshape(6, 8, 128), wq, s_w, b,
        r_row.reshape(6, 8, 1), s_next, op="none", interpret=True)
    assert q.shape == (6, 8, 128) and q.dtype == jnp.int8
    assert r.shape == (6, 8, 1) and r.dtype == jnp.float32


def test_eligibility():
    assert fused_eligible(1024, 768, 3072)  # the ViT-B/16 c_fc site
    assert not fused_eligible(1024, 96, 3072)  # K not lane-aligned
    assert not fused_eligible(1024, 768, 16384)  # 12 MB weight too big
    assert ffn_eligible(768, 3072, 768)  # ViT-B/16 FFN
    assert ffn_eligible(512, 2048, 512)  # CLIP text FFN
    assert not ffn_eligible(32, 128, 32)  # tiny test towers
    assert not ffn_eligible(2048, 4096, 2048)  # 16.8 MB of weights
    xq, wq, s_w, b, r_row, s_next = _site(8, 96, 128)
    with pytest.raises(ValueError, match="not eligible"):
        fused_int8_matmul_requant(jnp.asarray(xq), wq, s_w, b, r_row,
                                  s_next, interpret=True)
    with pytest.raises(ValueError, match="op must be"):
        fused_int8_matmul_requant(
            *(jnp.asarray(a) for a in _site(8, 128, 128)[:1]),
            *_site(8, 128, 128)[1:], op="ln", interpret=True)


def test_fused_ffn_gate_per_tower_defaults(monkeypatch):
    """The gate resolves env > caller default, per tower: text ON / ViT
    OFF are the measured defaults (_fused_ffn_wanted docstring), and
    TEXTREID_FUSED_INT8_FFN=on/off forces both."""
    from types import SimpleNamespace

    from textreid_tpu.models import int8_vit as iv

    wq = np.zeros((512, 2048), np.int8)
    tower = SimpleNamespace(units={
        "b.c_fc": {"w_q": wq},
        "b.c_proj": {"w_q": np.zeros((2048, 512), np.int8)},
    })
    monkeypatch.setattr(iv.jax, "default_backend", lambda: "tpu")

    monkeypatch.delenv("TEXTREID_FUSED_INT8_FFN", raising=False)
    assert iv._fused_ffn_wanted(tower, "b.", None, default=True)
    assert not iv._fused_ffn_wanted(tower, "b.", None, default=False)

    monkeypatch.setenv("TEXTREID_FUSED_INT8_FFN", "on")
    assert iv._fused_ffn_wanted(tower, "b.", None, default=False)
    monkeypatch.setenv("TEXTREID_FUSED_INT8_FFN", "off")
    assert not iv._fused_ffn_wanted(tower, "b.", None, default=True)

    # an explicit bool (the A/B driver) beats both env and default
    monkeypatch.setenv("TEXTREID_FUSED_INT8_FFN", "on")
    assert not iv._fused_ffn_wanted(tower, "b.", False, default=True)

    # ineligible shapes refuse regardless of the mode
    tiny = SimpleNamespace(units={
        "b.c_fc": {"w_q": np.zeros((32, 128), np.int8)},
        "b.c_proj": {"w_q": np.zeros((128, 32), np.int8)},
    })
    assert not iv._fused_ffn_wanted(tiny, "b.", True)
