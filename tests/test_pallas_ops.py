"""Pallas kernel tests (interpret mode on CPU; the same kernels are
exercised compiled on real TPU hardware by bench.py / the serving path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.models.gru import gru_scan
from textreid_tpu.ops.gru_pallas import gru_scan_pallas
from textreid_tpu.ops.ranking_pallas import topk_similarity, topk_similarity_padded


class TestGRUPallas:
    def test_matches_xla_scan(self):
        rng = np.random.RandomState(0)
        t, b, h = 7, 8, 16
        xg = jnp.asarray(rng.randn(t, b, 3 * h).astype(np.float32) * 0.3)
        wh = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
        h0 = jnp.zeros((b, h), jnp.float32)

        want = gru_scan(jnp.swapaxes(xg, 0, 1), wh, h0)  # [B, T, H]
        got = jnp.swapaxes(gru_scan_pallas(xg, wh, h0, interpret=True), 0, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_nonzero_initial_state(self):
        rng = np.random.RandomState(1)
        t, b, h = 3, 4, 8
        xg = jnp.asarray(rng.randn(t, b, 3 * h).astype(np.float32) * 0.5)
        wh = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.5)
        h0 = jnp.asarray(rng.randn(b, h).astype(np.float32))
        want = gru_scan(jnp.swapaxes(xg, 0, 1), wh, h0)
        got = jnp.swapaxes(gru_scan_pallas(xg, wh, h0, interpret=True), 0, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestTopKPallas:
    def _oracle(self, q, g, k):
        sim = q @ g.T
        idx = np.argsort(-sim, axis=1)[:, :k]
        vals = np.take_along_axis(sim, idx, axis=1)
        return vals, idx

    def test_matches_full_sort(self):
        rng = np.random.RandomState(0)
        q = rng.randn(8, 16).astype(np.float32)
        g = rng.randn(32, 16).astype(np.float32)
        k = 5
        vals, idx = topk_similarity(
            jnp.asarray(q), jnp.asarray(g), k=k, query_tile=8,
            gallery_tile=8, interpret=True,
        )
        want_vals, _ = self._oracle(q, g, k)
        np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-5)
        # indices give the same scores (ties may reorder)
        picked = np.take_along_axis(q @ g.T, np.asarray(idx), axis=1)
        np.testing.assert_allclose(picked, want_vals, atol=1e-5)

    def test_negative_scores_survive_padding(self):
        """Padded gallery rows must not displace real negative-score items."""
        rng = np.random.RandomState(2)
        q = rng.randn(4, 8).astype(np.float32)
        g = -np.abs(rng.randn(10, 8)).astype(np.float32)  # all scores mixed
        vals, idx = topk_similarity_padded(
            jnp.asarray(q), jnp.asarray(g), k=3, query_tile=4,
            gallery_tile=8, interpret=True,
        )
        want_vals, _ = self._oracle(q, g, 3)
        np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-5)
        assert (np.asarray(idx) < 10).all() and (np.asarray(idx) >= 0).all()

    def test_multi_tile_both_axes(self):
        rng = np.random.RandomState(3)
        q = rng.randn(16, 8).astype(np.float32)
        g = rng.randn(24, 8).astype(np.float32)
        vals, idx = topk_similarity(
            jnp.asarray(q), jnp.asarray(g), k=4, query_tile=8,
            gallery_tile=8, interpret=True,
        )
        want_vals, _ = self._oracle(q, g, 4)
        np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-5)

    def test_rows_sorted_descending(self):
        rng = np.random.RandomState(4)
        q = rng.randn(8, 8).astype(np.float32)
        g = rng.randn(16, 8).astype(np.float32)
        vals, _ = topk_similarity(
            jnp.asarray(q), jnp.asarray(g), k=6, query_tile=8,
            gallery_tile=8, interpret=True,
        )
        v = np.asarray(vals)
        assert (np.diff(v, axis=1) <= 1e-6).all()


class TestHybridVJP:
    def test_gradients_match_xla_scan(self):
        """The custom-VJP hybrid (Pallas fwd, XLA-scan bwd) must produce the
        same gradients as differentiating the XLA scan directly."""
        from textreid_tpu.ops.gru_pallas import (
            _xla_scan_forward,
            make_hybrid_scan,
        )

        rng = np.random.RandomState(3)
        t, b, h = 5, 4, 8
        xg = jnp.asarray(rng.randn(t, b, 3 * h).astype(np.float32) * 0.4)
        wh = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.4)
        h0 = jnp.asarray(rng.randn(b, h).astype(np.float32) * 0.2)
        cot = jnp.asarray(rng.randn(t, b, h).astype(np.float32))

        hybrid = make_hybrid_scan(interpret=True)

        def loss_hybrid(xg, wh, h0):
            return jnp.sum(hybrid(xg, wh, h0) * cot)

        def loss_xla(xg, wh, h0):
            return jnp.sum(_xla_scan_forward(xg, wh, h0) * cot)

        g_hybrid = jax.grad(loss_hybrid, argnums=(0, 1, 2))(xg, wh, h0)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(xg, wh, h0)
        for a, b_ in zip(g_hybrid, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-5)
        # and the primal values agree too
        np.testing.assert_allclose(
            np.asarray(hybrid(xg, wh, h0)),
            np.asarray(_xla_scan_forward(xg, wh, h0)), atol=1e-5,
        )
