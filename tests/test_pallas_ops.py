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

    def test_k_equals_one(self):
        """k=1 regression: the insertion-merge's shift slice is [Qt, 0] —
        it must special-case instead of emitting an unlowerable vector."""
        rng = np.random.RandomState(5)
        q = rng.randn(8, 8).astype(np.float32)
        g = rng.randn(24, 8).astype(np.float32)
        vals, idx = topk_similarity(
            jnp.asarray(q), jnp.asarray(g), k=1, query_tile=8,
            gallery_tile=8, interpret=True,
        )
        want_vals, want_idx = self._oracle(q, g, 1)
        np.testing.assert_allclose(np.asarray(vals), want_vals, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)

    def test_bf16_compute_dtype_matches_xla_bf16(self):
        """compute_dtype=bf16 must reproduce an XLA bf16-inputs /
        f32-accumulate contraction's ranking."""
        rng = np.random.RandomState(6)
        q = rng.randn(8, 16).astype(np.float32)
        g = rng.randn(32, 16).astype(np.float32)
        k = 4
        vals, idx = topk_similarity(
            jnp.asarray(q), jnp.asarray(g), k=k, query_tile=8,
            gallery_tile=8, interpret=True, compute_dtype=jnp.bfloat16,
        )
        sim = jax.lax.dot_general(
            jnp.asarray(q).astype(jnp.bfloat16),
            jnp.asarray(g).astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        want_vals, want_idx = jax.lax.top_k(sim, k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   atol=1e-6)
        picked = np.take_along_axis(np.asarray(sim), np.asarray(idx), axis=1)
        np.testing.assert_allclose(picked, np.asarray(want_vals), atol=1e-6)


class TestQuantizedTopKPallas:
    """Streaming int8 top-k: must reproduce the materializing
    ``quant.quantized_topk`` exactly (same bf16 contraction + f32
    accumulation; int8 -> bf16 is exact)."""

    def _setup(self, q_rows=8, g_rows=32, dim=16, seed=0):
        from textreid_tpu.ops.quant import quantize_rows

        rng = np.random.RandomState(seed)
        q = rng.randn(q_rows, dim).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g = rng.randn(g_rows, dim).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        return jnp.asarray(q), quantize_rows(jnp.asarray(g))

    def test_matches_materializing_quantized_topk(self):
        from textreid_tpu.ops.quant import quantized_topk
        from textreid_tpu.ops.ranking_pallas import topk_similarity_quantized

        q, qgal = self._setup()
        k = 5
        sv, si = topk_similarity_quantized(
            q, qgal.values, qgal.scales, k=k, query_tile=8, gallery_tile=8,
            interpret=True,
        )
        mv, mi = quantized_topk(q, qgal, k)
        np.testing.assert_allclose(np.asarray(sv), np.asarray(mv),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(mi))

    def test_padded_wrapper_masks_pad_rows(self):
        from textreid_tpu.ops.quant import quantized_topk
        from textreid_tpu.ops.ranking_pallas import (
            topk_similarity_quantized_padded,
        )

        q, qgal = self._setup(q_rows=5, g_rows=11)
        sv, si = topk_similarity_quantized_padded(
            q, qgal, k=4, query_tile=8, gallery_tile=8, interpret=True)
        mv, mi = quantized_topk(q, qgal, 4)
        np.testing.assert_allclose(np.asarray(sv), np.asarray(mv), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(mi))
        assert (np.asarray(si) < 11).all()


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


class TestBiGRUPooledPallas:
    """Fused bidirectional scan + masked max-over-time kernel."""

    def _setup(self, seed=0, t=9, b=8, h=16):
        from textreid_tpu.models.gru import reverse_padded

        rng = np.random.RandomState(seed)
        xf = jnp.asarray(rng.randn(b, t, 3 * h).astype(np.float32) * 0.3)
        x_raw = jnp.asarray(rng.randn(b, t, 3 * h).astype(np.float32) * 0.3)
        lengths = jnp.asarray(rng.randint(1, t + 1, size=b).astype(np.int32))
        xb = reverse_padded(x_raw, lengths)
        wf = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
        wb = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
        return xf, xb, wf, wb, lengths

    def _xla_oracle(self, xf, xb, wf, wb, lengths):
        from textreid_tpu.ops.gru_pallas import _xla_pooled_forward

        return _xla_pooled_forward(
            jnp.swapaxes(xf, 0, 1), jnp.swapaxes(xb, 0, 1), wf, wb, lengths
        )

    def test_matches_xla_masked_maxpool(self):
        from textreid_tpu.ops.gru_pallas import bigru_pooled_scan

        xf, xb, wf, wb, lengths = self._setup()
        got = bigru_pooled_scan(xf, xb, wf, wb, lengths, interpret=True)
        want = self._xla_oracle(xf, xb, wf, wb, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_full_length_sample_keeps_negative_channels(self):
        """A sample with no padding must NOT get the zero clamp
        (reference gru.py:62-64: only padded positions contribute zeros)."""
        from textreid_tpu.ops.gru_pallas import bigru_pooled_scan

        xf, xb, wf, wb, _ = self._setup(seed=3, t=5, b=4, h=8)
        lengths = jnp.asarray([5, 5, 2, 1], jnp.int32)
        got = bigru_pooled_scan(xf, xb, wf, wb, lengths, interpret=True)
        want = self._xla_oracle(xf, xb, wf, wb, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # padded samples are clamped at >= 0; full-length ones may go below
        assert np.asarray(got)[2:].min() >= 0.0

    def test_gradients_match_xla(self):
        from textreid_tpu.ops.gru_pallas import bigru_pooled_scan

        xf, xb, wf, wb, lengths = self._setup(seed=5, t=6, b=4, h=8)

        def loss_fused(xf, xb, wf, wb):
            out = bigru_pooled_scan(xf, xb, wf, wb, lengths, interpret=True)
            return jnp.sum(out * out)

        def loss_xla(xf, xb, wf, wb):
            out = self._xla_oracle(xf, xb, wf, wb, lengths)
            return jnp.sum(out * out)

        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xf, xb, wf, wb)
        want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(xf, xb, wf, wb)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-5)

    def test_encoder_uses_fused_path(self):
        """BiGRUEncoder(use_pallas=True) output equals the plain-XLA encoder
        (interpret-mode patching of the kernel)."""
        from unittest import mock

        import textreid_tpu.ops.gru_pallas as gp
        from textreid_tpu.models.gru import BiGRUEncoder

        rng = np.random.RandomState(2)
        tokens = jnp.asarray(rng.randint(1, 40, (4, 7)).astype(np.int32))
        lengths = jnp.asarray([7, 3, 5, 1], jnp.int32)

        plain = BiGRUEncoder(hidden_dim=8, vocab_size=40, embed_size=8)
        variables = plain.init(jax.random.PRNGKey(0), tokens, lengths)
        want = plain.apply(variables, tokens, lengths)

        fused = BiGRUEncoder(hidden_dim=8, vocab_size=40, embed_size=8,
                             use_pallas=True)
        orig = gp._bigru_pooled_pallas
        with mock.patch.object(
            gp, "_bigru_pooled_pallas",
            lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
        ):
            got = fused.apply(variables, tokens, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestGRUMeshPartitioning:
    """Both GRU kernel entry points are mesh-native via custom_partitioning
    (ops/gru_pallas._make_batch_partitioned): under a batch-sharded jit each
    device runs the kernel on its own batch shard with the recurrent weights
    replicated — no all-gather of the activations around the opaque custom
    call (GSPMD's default), same contract as ops/attention_pallas."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()), ("data",))

    def test_sharded_scan_no_allgather_and_exact(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from textreid_tpu.ops.gru_pallas import (
            _xla_scan_forward,
            make_hybrid_scan,
        )

        mesh = self._mesh()
        n = len(jax.devices())
        rng = np.random.RandomState(30)
        t, b, h = 6, 4 * n, 8
        xg = jnp.asarray(rng.randn(t, b, 3 * h).astype(np.float32) * 0.3)
        wh = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
        h0 = jnp.zeros((b, h), jnp.float32)

        x_sh = NamedSharding(mesh, P(None, "data", None))
        h_sh = NamedSharding(mesh, P("data", None))
        rep = NamedSharding(mesh, P())
        hybrid = make_hybrid_scan(interpret=True)
        f = jax.jit(hybrid, in_shardings=(x_sh, rep, h_sh),
                    out_shardings=x_sh)
        args = (jax.device_put(xg, x_sh), jax.device_put(wh, rep),
                jax.device_put(h0, h_sh))
        hlo = f.lower(*args).compile().as_text()
        assert hlo.count("all-gather") == 0
        np.testing.assert_allclose(
            np.asarray(f(*args)),
            np.asarray(_xla_scan_forward(xg, wh, h0)), atol=1e-5)

    def test_sharded_pooled_no_allgather_and_exact(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from textreid_tpu.ops.gru_pallas import (
            _partitioned_pooled,
            _xla_pooled_forward,
        )

        mesh = self._mesh()
        n = len(jax.devices())
        rng = np.random.RandomState(31)
        t, b, h = 5, 2 * n, 8
        xf = jnp.asarray(rng.randn(b, t, 3 * h).astype(np.float32) * 0.3)
        xb = jnp.asarray(rng.randn(b, t, 3 * h).astype(np.float32) * 0.3)
        wf = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
        wb = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
        lengths = jnp.asarray(rng.randint(1, t + 1, size=b), jnp.int32)

        b_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        pooled = _partitioned_pooled(True)
        f = jax.jit(pooled, in_shardings=(b_sh, b_sh, rep, rep, b_sh),
                    out_shardings=b_sh)
        args = (jax.device_put(xf, b_sh), jax.device_put(xb, b_sh),
                jax.device_put(wf, rep), jax.device_put(wb, rep),
                jax.device_put(lengths, b_sh))
        hlo = f.lower(*args).compile().as_text()
        assert hlo.count("all-gather") == 0
        # kernel-side pooled value = max over valid steps, no zero clamp;
        # compare against the unclamped part of the XLA oracle
        want_full = _xla_pooled_forward(
            jnp.swapaxes(xf, 0, 1), jnp.swapaxes(xb, 0, 1), wf, wb,
            lengths, pool_mode="always")
        got = np.asarray(f(*args))
        want = np.asarray(want_full)
        # only unpadded rows are directly comparable (clamp applied outside
        # the kernel); padded rows must match after the same clamp
        pad = np.asarray(lengths) < t
        np.testing.assert_allclose(
            np.where(pad[:, None], np.maximum(got, 0.0), got), want,
            atol=1e-5)


class TestTopKAdversarialTies:
    """The lex-live-set merge (round 4: no retire-write, extraction
    tracked by the last (value, col) pair) must stay exact under heavy
    value duplication — the regime where the tie bookkeeping, not the
    values, decides every slot."""

    def test_massive_duplication_exact_order(self):
        from textreid_tpu.ops.ranking_pallas import topk_similarity

        rng = np.random.RandomState(0)
        # scores drawn from only 5 distinct values: nearly every
        # extraction is a tie chain, within and across gallery tiles
        d = 8
        q = jnp.eye(4, d, dtype=jnp.float32)
        levels = np.asarray([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
        g = np.zeros((64, d), np.float32)
        g[:, :4] = levels[rng.randint(0, 5, (64, 4))]
        vals, idx = topk_similarity(jnp.asarray(q), jnp.asarray(g), k=8,
                                    query_tile=4, gallery_tile=16,
                                    interpret=True)
        sim = np.asarray(q) @ g.T
        for r in range(4):
            # expected order: value desc, then index desc within ties
            order = sorted(range(64), key=lambda c: (-sim[r, c], -c))[:8]
            np.testing.assert_array_equal(np.asarray(idx)[r], order)
            np.testing.assert_allclose(np.asarray(vals)[r],
                                       sim[r, order], rtol=1e-6)

    def test_all_equal_scores_pick_largest_indices(self):
        from textreid_tpu.ops.ranking_pallas import topk_similarity

        q = jnp.ones((4, 8), jnp.float32)
        g = jnp.ones((32, 8), jnp.float32)
        vals, idx = topk_similarity(q, g, k=5, query_tile=4,
                                    gallery_tile=8, interpret=True)
        for r in range(4):
            np.testing.assert_array_equal(np.asarray(idx)[r],
                                          [31, 30, 29, 28, 27])
