"""Serving API tests: gallery indexing + text query search, single device
and gallery-sharded over the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.engine.state import TrainState
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.m_resnet import ModifiedResNet
from textreid_tpu.parallel import make_mesh
from textreid_tpu.serving import RetrievalIndex


@pytest.fixture(scope="module")
def model_and_state():
    model = TextReIDModel(
        visual=ModifiedResNet(layers=(1, 1, 1, 1), output_dim=16, heads=4,
                              last_stride=1, input_resolution=(32, 16),
                              width=16),
        textual=BiGRUEncoder(hidden_dim=8, vocab_size=30, embed_size=8),
        feature_size=16, num_classes=4,
    )
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8))
    ids = jnp.asarray(rng.randint(1, 30, (2, 8)).astype(np.int32))
    lens = jnp.asarray([8, 4], dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), pixels, ids, lens,
                           method="init_all")
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}), opt_state=None,
    )
    return model, state


def _gallery_batches(n=10, bs=5, seed=1):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (bs, 32, 16, 3), dtype=np.uint8)
            for _ in range(n // bs)]


class TestRetrievalIndex:
    def test_search_returns_ranked_matches(self, model_and_state):
        model, state = model_and_state
        index = RetrievalIndex(model, state, query_batch=4, use_pallas=False)
        index.build_gallery(_gallery_batches(),
                            meta=np.arange(100, 110))
        rng = np.random.RandomState(2)
        token_ids = rng.randint(1, 30, (3, 8)).astype(np.int32)
        lengths = np.array([8, 5, 2], np.int32)
        scores, meta = index.search(token_ids, lengths, k=4)
        assert scores.shape == (3, 4) and meta.shape == (3, 4)
        assert (np.diff(scores, axis=1) <= 1e-6).all()  # descending
        assert set(meta.ravel()).issubset(set(range(100, 110)))

    def test_query_batch_padding_invariant(self, model_and_state):
        """Results must not depend on how queries pack into padded batches."""
        model, state = model_and_state
        idx_small = RetrievalIndex(model, state, query_batch=2,
                                   use_pallas=False)
        idx_big = RetrievalIndex(model, state, query_batch=16,
                                 use_pallas=False)
        g = _gallery_batches()
        idx_small.build_gallery(g)
        idx_big.build_gallery(g)
        rng = np.random.RandomState(3)
        token_ids = rng.randint(1, 30, (5, 8)).astype(np.int32)
        lengths = rng.randint(1, 8, 5).astype(np.int32)
        s1, m1 = idx_small.search(token_ids, lengths, k=3)
        s2, m2 = idx_big.search(token_ids, lengths, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)

    def test_k_beyond_gallery_returns_sentinels(self, model_and_state):
        """k > |gallery| on a sharded mesh: slots past the real rows must
        carry -inf score AND -1 metadata — never a clipped alias of a real
        id that a score-ignoring caller would treat as a match (VERDICT r2
        weak #6)."""
        model, state = model_and_state
        mesh = make_mesh(8)
        for index in (
            RetrievalIndex(model, state, mesh=mesh, use_pallas=False),
            RetrievalIndex(model, state, use_pallas=False),
        ):
            index.build_gallery(_gallery_batches(n=10),
                                meta=np.arange(100, 110))
            rng = np.random.RandomState(5)
            token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
            lengths = np.full(2, 8, np.int32)
            scores, meta = index.search(token_ids, lengths, k=12)
            assert scores.shape == (2, 12) and meta.shape == (2, 12)
            # 10 real rows -> exactly 2 sentinel slots per query
            assert (np.isinf(scores[:, 10:]) & (scores[:, 10:] < 0)).all()
            assert (meta[:, 10:] == -1).all()
            assert np.isfinite(scores[:, :10]).all()
            assert set(meta[:, :10].ravel()) == set(range(100, 110))

    def test_sharded_gallery_matches_single_device(self, model_and_state):
        model, state = model_and_state
        plain = RetrievalIndex(model, state, use_pallas=False)
        mesh = make_mesh(8)
        sharded = RetrievalIndex(model, state, mesh=mesh, use_pallas=False)
        g = _gallery_batches(n=10)
        plain.build_gallery(g)
        sharded.build_gallery(g)  # 10 rows padded to 16 across 8 shards
        rng = np.random.RandomState(4)
        token_ids = rng.randint(1, 30, (4, 8)).astype(np.int32)
        lengths = np.full(4, 8, np.int32)
        s1, m1 = plain.search(token_ids, lengths, k=3)
        s2, m2 = sharded.search(token_ids, lengths, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)


class TestIndexPersistence:
    def test_save_load_roundtrip(self, model_and_state, tmp_path):
        """A replica booting from a saved index must answer identically to
        the instance that built it — including the quantized form."""
        model, state = model_and_state
        built = RetrievalIndex(model, state, use_pallas=False, quantize=True)
        built.build_gallery(_gallery_batches(n=10),
                            meta=np.arange(300, 310))
        path = str(tmp_path / "gallery.idx")
        built.save_index(path)

        booted = RetrievalIndex(model, state, use_pallas=False,
                                quantize=True)
        booted.load_index(path)
        rng = np.random.RandomState(9)
        token_ids = rng.randint(1, 30, (3, 8)).astype(np.int32)
        lengths = np.full(3, 8, np.int32)
        s1, m1 = built.search(token_ids, lengths, k=4)
        s2, m2 = booted.search(token_ids, lengths, k=4)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        np.testing.assert_array_equal(m1, m2)

    def test_failed_load_leaves_previous_gallery_serving(
            self, model_and_state, tmp_path):
        """load_index must be all-or-nothing: a truncated/incomplete file
        (np.load is lazy per member, so corruption can surface on the
        SECOND member read) must not leave the old gallery serving through
        the new file's metadata (code-review round 4)."""
        model, state = model_and_state
        index = RetrievalIndex(model, state, use_pallas=False)
        index.build_gallery(_gallery_batches(n=10),
                            meta=np.arange(100, 110))
        rng = np.random.RandomState(7)
        token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
        lengths = np.full(2, 8, np.int32)
        s1, m1 = index.search(token_ids, lengths, k=4)

        bad = str(tmp_path / "bad.npz")
        np.savez(bad, meta=np.arange(5))  # no "gallery" member
        with pytest.raises(KeyError):
            index.load_index(bad)
        assert len(index.gallery_meta) == 10  # untouched
        s2, m2 = index.search(token_ids, lengths, k=4)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_allclose(s1, s2, atol=0)

    def test_cross_topology_roundtrip(self, model_and_state, tmp_path):
        """An index built on a mesh whose padding augmented the features
        ([G+pad, D+1]) must persist CLEAN and load onto a single-device
        replica — the documented boot workflow (code-review finding r3)."""
        model, state = model_and_state
        built = RetrievalIndex(model, state, mesh=make_mesh(8),
                               use_pallas=False)
        built.build_gallery(_gallery_batches(n=10),
                            meta=np.arange(400, 410))  # 10 -> padded 16
        assert built._augmented
        path = str(tmp_path / "gallery.idx")
        built.save_index(path)

        plain = RetrievalIndex(model, state, use_pallas=False)
        plain.load_index(path)
        assert plain.gallery.shape == (10, 16)  # clean rows, clean dims
        rng = np.random.RandomState(11)
        token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
        lengths = np.full(2, 8, np.int32)
        s1, m1 = built.search(token_ids, lengths, k=3)
        s2, m2 = plain.search(token_ids, lengths, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)

    def test_mesh_k_beyond_padded_rows(self, model_and_state):
        """k larger than even the padded row count must return sentinels on
        the mesh path, not raise 'top-k infeasible' (code-review finding)."""
        model, state = model_and_state
        index = RetrievalIndex(model, state, mesh=make_mesh(8),
                               use_pallas=False)
        index.build_gallery(_gallery_batches(n=10),
                            meta=np.arange(500, 510))  # padded to 16 rows
        rng = np.random.RandomState(12)
        token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
        lengths = np.full(2, 8, np.int32)
        scores, meta = index.search(token_ids, lengths, k=20)
        assert scores.shape == (2, 20)
        assert (meta[:, 10:] == -1).all()
        assert (np.isinf(scores[:, 10:]) & (scores[:, 10:] < 0)).all()
        assert set(meta[:, :10].ravel()) == set(range(500, 510))

    def test_legacy_augmented_format_loads_clean(self, model_and_state,
                                                 tmp_path):
        """Indexes persisted by the pre-refactor save_index stored the mesh
        topology artifact ([G+pad, D+1] + an 'augmented' flag); load_index
        must strip it back to the clean matrix instead of serving a
        shape-mismatched gallery (code-review finding)."""
        model, state = model_and_state
        ref = RetrievalIndex(model, state, use_pallas=False)
        ref.build_gallery(_gallery_batches(n=10), meta=np.arange(700, 710))
        clean = np.asarray(ref.gallery)  # [10, 16]
        # forge the legacy layout: 6 pad rows, one augmented column
        aug = np.concatenate([clean, np.zeros((10, 1), clean.dtype)], axis=1)
        pads = np.concatenate(
            [np.zeros((6, 16)), np.full((6, 1), -2.0)], axis=1
        ).astype(clean.dtype)
        legacy_path = str(tmp_path / "legacy.idx")
        np.savez(legacy_path.replace(".idx", ""),
                 gallery=np.concatenate([aug, pads]),
                 meta=np.arange(700, 710), augmented=np.asarray(True))
        import os

        os.rename(legacy_path.replace(".idx", "") + ".npz", legacy_path)

        loaded = RetrievalIndex(model, state, use_pallas=False)
        loaded.load_index(legacy_path)
        assert loaded.gallery.shape == (10, 16)
        rng = np.random.RandomState(13)
        token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
        lengths = np.full(2, 8, np.int32)
        s1, m1 = ref.search(token_ids, lengths, k=3)
        s2, m2 = loaded.search(token_ids, lengths, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)

    def test_load_onto_mesh_reshards(self, model_and_state, tmp_path):
        model, state = model_and_state
        built = RetrievalIndex(model, state, mesh=make_mesh(8),
                               use_pallas=False)
        built.build_gallery(_gallery_batches(n=10))  # padded 10 -> 16
        path = str(tmp_path / "gallery.idx")
        built.save_index(path)

        booted = RetrievalIndex(model, state, mesh=make_mesh(8),
                                use_pallas=False)
        booted.load_index(path)
        rng = np.random.RandomState(10)
        token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
        lengths = np.full(2, 8, np.int32)
        s1, m1 = built.search(token_ids, lengths, k=3)
        s2, m2 = booted.search(token_ids, lengths, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        np.testing.assert_array_equal(m1, m2)


class TestQuantizedGallery:
    def test_roundtrip_error_small(self):
        from textreid_tpu.ops.quant import dequantize_rows, quantize_rows

        rng = np.random.RandomState(0)
        e = rng.randn(20, 16).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        q = quantize_rows(jnp.asarray(e))
        back = np.asarray(dequantize_rows(q))
        assert q.values.dtype == jnp.int8
        np.testing.assert_allclose(back, e, atol=1.5 / 127)

    def test_quantized_streaming_matches_materializing(self, model_and_state):
        """quantize=True + use_pallas=True must route through the streaming
        int8 kernel and return exactly what the materializing int8 path
        returns (same bf16 numerics)."""
        model, state = model_and_state
        mat = RetrievalIndex(model, state, use_pallas=False, quantize=True)
        stream = RetrievalIndex(model, state, use_pallas=True, quantize=True)
        g = _gallery_batches(n=10)
        mat.build_gallery(g)
        stream.build_gallery(g)
        rng = np.random.RandomState(8)
        token_ids = rng.randint(1, 30, (4, 8)).astype(np.int32)
        lengths = np.full(4, 8, np.int32)
        s1, m1 = mat.search(token_ids, lengths, k=3)
        s2, m2 = stream.search(token_ids, lengths, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        np.testing.assert_array_equal(m1, m2)

    def test_quantized_search_preserves_topk(self, model_and_state):
        """int8 gallery must agree with float search on well-separated
        galleries (rank-1 identical, scores within quantization error)."""
        model, state = model_and_state
        plain = RetrievalIndex(model, state, use_pallas=False)
        quant = RetrievalIndex(model, state, use_pallas=False, quantize=True)
        g = _gallery_batches(n=10)
        plain.build_gallery(g)
        quant.build_gallery(g)
        rng = np.random.RandomState(6)
        token_ids = rng.randint(1, 30, (6, 8)).astype(np.int32)
        lengths = np.full(6, 8, np.int32)
        s1, m1 = plain.search(token_ids, lengths, k=3)
        s2, m2 = quant.search(token_ids, lengths, k=3)
        np.testing.assert_array_equal(m1[:, 0], m2[:, 0])  # rank-1 agrees
        np.testing.assert_allclose(s1, s2, atol=0.05)


class TestQuantizedMeshServing:
    """quantize=True on a mesh must actually serve int8 (the r3 silent
    float downgrade is gone): sharded-quantized results match the
    single-device quantized index exactly, including augmented pad rows."""

    def test_mesh_quantized_matches_single_device_quantized(
            self, model_and_state):
        model, state = model_and_state
        plain = RetrievalIndex(model, state, use_pallas=False, quantize=True)
        sharded = RetrievalIndex(model, state, mesh=make_mesh(8),
                                 use_pallas=False, quantize=True)
        g = _gallery_batches(n=10)
        plain.build_gallery(g, meta=np.arange(800, 810))
        sharded.build_gallery(g, meta=np.arange(800, 810))
        assert sharded.quantize and sharded._augmented  # 10 -> 16 rows
        assert sharded._quant_gallery.values.dtype == jnp.int8
        rng = np.random.RandomState(14)
        token_ids = rng.randint(1, 30, (4, 8)).astype(np.int32)
        lengths = np.full(4, 8, np.int32)
        s1, m1 = plain.search(token_ids, lengths, k=3)
        s2, m2 = sharded.search(token_ids, lengths, k=3)
        # same int8 contraction (+ an exact-zero augmented column on the
        # mesh): identical winners, scores to quantization rounding
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_allclose(s1, s2, atol=2e-2)

    def test_mesh_quantized_pad_rows_never_win(self, model_and_state):
        """Augmented pad rows quantize to an exact -2 score and must lose
        to every real row even when k spans the whole padded gallery."""
        model, state = model_and_state
        index = RetrievalIndex(model, state, mesh=make_mesh(8),
                               use_pallas=False, quantize=True)
        index.build_gallery(_gallery_batches(n=10),
                            meta=np.arange(900, 910))
        rng = np.random.RandomState(15)
        token_ids = rng.randint(1, 30, (3, 8)).astype(np.int32)
        lengths = np.full(3, 8, np.int32)
        scores, meta = index.search(token_ids, lengths, k=16)
        assert (meta[:, 10:] == -1).all()
        assert (np.isinf(scores[:, 10:]) & (scores[:, 10:] < 0)).all()
        assert set(meta[:, :10].ravel()) == set(range(900, 910))

    def test_mesh_quantized_pallas_interpret_matches(self, model_and_state):
        model, state = model_and_state
        xla = RetrievalIndex(model, state, mesh=make_mesh(8),
                             use_pallas=False, quantize=True)
        pallas = RetrievalIndex(model, state, mesh=make_mesh(8),
                                use_pallas=True, quantize=True)
        g = _gallery_batches(n=16)  # divides evenly: no augmentation
        xla.build_gallery(g, meta=np.arange(16))
        pallas.build_gallery(g, meta=np.arange(16))
        rng = np.random.RandomState(16)
        token_ids = rng.randint(1, 30, (3, 8)).astype(np.int32)
        lengths = np.full(3, 8, np.int32)
        s1, m1 = xla.search(token_ids, lengths, k=4)
        s2, m2 = pallas.search(token_ids, lengths, k=4)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)


class TestValidRowsTrim:
    def test_padded_tail_rows_dropped(self, model_and_state):
        """build_gallery(valid_rows=N) drops encode-side pad rows so a
        duplicate of the last image can never displace a real top-k
        result (tools/build_index.py pads its tail batch to the compiled
        shape)."""
        model, state = model_and_state
        rng = np.random.RandomState(20)
        imgs = rng.randint(0, 255, (7, 32, 16, 3), dtype=np.uint8)
        # two fixed-shape batches of 5: the second is padded with
        # duplicates of the last real image
        b1 = imgs[:5]
        b2 = np.concatenate([imgs[5:], imgs[6:7], imgs[6:7], imgs[6:7]])
        padded = RetrievalIndex(model, state, use_pallas=False)
        padded.build_gallery([b1, b2], meta=np.arange(7), valid_rows=7)
        assert padded.gallery.shape[0] == 7
        assert len(padded.gallery_meta) == 7

        exact = RetrievalIndex(model, state, use_pallas=False)
        exact.build_gallery([imgs[:5], imgs[5:]], meta=np.arange(7))
        token_ids = rng.randint(1, 30, (3, 8)).astype(np.int32)
        lengths = np.full(3, 8, np.int32)
        s1, m1 = padded.search(token_ids, lengths, k=7)
        s2, m2 = exact.search(token_ids, lengths, k=7)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)


class TestLargeKRouting:
    def test_large_k_routes_to_materializing_path(self, model_and_state):
        """k beyond the streaming kernel's design point (insertion merge,
        k <= 64) compiles the materializing sort path instead — results
        must equal the non-pallas index exactly."""
        model, state = model_and_state
        pallas = RetrievalIndex(model, state, use_pallas=True)
        plain = RetrievalIndex(model, state, use_pallas=False)
        rng = np.random.RandomState(40)
        batches = [rng.randint(0, 255, (10, 32, 16, 3), dtype=np.uint8)
                   for _ in range(10)]
        pallas.build_gallery(batches, meta=np.arange(100))
        plain.build_gallery(batches, meta=np.arange(100))
        token_ids = rng.randint(1, 30, (2, 8)).astype(np.int32)
        lengths = np.full(2, 8, np.int32)
        s1, m1 = pallas.search(token_ids, lengths, k=80)  # > PALLAS_K_MAX
        s2, m2 = plain.search(token_ids, lengths, k=80)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)


class TestImageQueries:
    """search_by_image: person re-id by example through the same index."""

    def test_self_query_ranks_itself_first(self, model_and_state):
        model, state = model_and_state
        index = RetrievalIndex(model, state, use_pallas=False,
                               image_query_batch=4)
        batches = _gallery_batches()
        index.build_gallery(batches, meta=np.arange(100, 110))
        gallery_imgs = np.concatenate(batches)
        queries = gallery_imgs[[0, 3, 7]]
        scores, meta = index.search_by_image(queries, k=3)
        assert scores.shape == (3, 3) and meta.shape == (3, 3)
        # a gallery image queried against the gallery is its own best match
        np.testing.assert_array_equal(meta[:, 0], [100, 103, 107])
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-4)
        assert (np.diff(scores, axis=1) <= 1e-6).all()

    def test_image_query_batch_padding_invariant(self, model_and_state):
        """Results must not depend on how queries chunk into the fixed
        image_query_batch shape."""
        model, state = model_and_state
        small = RetrievalIndex(model, state, use_pallas=False,
                               image_query_batch=2)
        big = RetrievalIndex(model, state, use_pallas=False,
                             image_query_batch=16)
        g = _gallery_batches()
        small.build_gallery(g)
        big.build_gallery(g)
        rng = np.random.RandomState(7)
        queries = rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
        s1, m1 = small.search_by_image(queries, k=4)
        s2, m2 = big.search_by_image(queries, k=4)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)

    def test_quantized_image_search(self, model_and_state):
        """int8 gallery scoring serves image queries through the same
        rank-only program; the exact self-match survives quantization."""
        model, state = model_and_state
        index = RetrievalIndex(model, state, use_pallas=False,
                               quantize=True)
        batches = _gallery_batches()
        index.build_gallery(batches, meta=np.arange(100, 110))
        queries = np.concatenate(batches)[[2, 9]]
        scores, meta = index.search_by_image(queries, k=2)
        np.testing.assert_array_equal(meta[:, 0], [102, 109])
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=0.05)

    def test_mesh_image_search_matches_single_device(self, model_and_state):
        model, state = model_and_state
        plain = RetrievalIndex(model, state, use_pallas=False)
        sharded = RetrievalIndex(model, state, mesh=make_mesh(8),
                                 use_pallas=False)
        g = _gallery_batches(n=10)
        plain.build_gallery(g)
        sharded.build_gallery(g)  # 10 rows padded to 16 across 8 shards
        rng = np.random.RandomState(8)
        queries = rng.randint(0, 255, (3, 32, 16, 3), dtype=np.uint8)
        s1, m1 = plain.search_by_image(queries, k=3)
        s2, m2 = sharded.search_by_image(queries, k=3)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        np.testing.assert_array_equal(m1, m2)

    def test_k_beyond_gallery_returns_sentinels(self, model_and_state):
        model, state = model_and_state
        index = RetrievalIndex(model, state, use_pallas=False)
        index.build_gallery(_gallery_batches(n=5, bs=5),
                            meta=np.arange(5))
        rng = np.random.RandomState(9)
        queries = rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8)
        scores, meta = index.search_by_image(queries, k=8)
        assert scores.shape == (2, 8)
        assert (meta[:, 5:] == -1).all()
        assert np.isneginf(scores[:, 5:]).all()
        assert (meta[:, :5] >= 0).all()
