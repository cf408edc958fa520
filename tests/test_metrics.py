"""Evaluator tests: CMC/mAP on hand-checked cases, Jaccard rerank vs a
brute-force set oracle, gallery dedupe (SURVEY.md section 4.1)."""

import numpy as np
import jax.numpy as jnp

from textreid_tpu.evaluation.metrics import (
    evaluation,
    format_results_table,
    get_unique_indices,
    k_reciprocal,
    rank,
)


class TestRank:
    def test_hand_computed_cmc(self):
        # 2 queries, 4 gallery items.
        sim = jnp.array(
            [
                [0.9, 0.1, 0.8, 0.2],  # q0: ranked g0,g2,g3,g1
                [0.1, 0.7, 0.2, 0.9],  # q1: ranked g3,g1,g2,g0
            ]
        )
        q_pids = jnp.array([1, 2])
        g_pids = jnp.array([3, 2, 1, 2])
        # q0 match first at rank 2 (g2, pid1); q1 match at rank 1 (g3, pid2)
        cmc, mean_ap, _ = rank(sim, q_pids, g_pids, topk=(1, 2, 4))
        np.testing.assert_allclose(np.asarray(cmc), [50.0, 100.0, 100.0])
        # AP(q0): one relevant at rank2 -> 1/2. AP(q1): rel at ranks1,2 -> (1+1)/2=1
        np.testing.assert_allclose(float(mean_ap), 75.0, atol=1e-4)

    def test_topk_fast_path_matches_full_sort(self):
        rng = np.random.RandomState(3)
        sim = jnp.asarray(rng.randn(20, 30).astype(np.float32))
        q = jnp.asarray(rng.randint(0, 5, 20))
        g = jnp.asarray(rng.randint(0, 5, 30))
        full_cmc, _, _ = rank(sim, q, g, topk=(1, 5, 10), get_map=True)
        fast_cmc, _ = rank(sim, q, g, topk=(1, 5, 10), get_map=False)
        np.testing.assert_allclose(np.asarray(full_cmc), np.asarray(fast_cmc),
                                   atol=1e-5)


class TestKReciprocal:
    def test_matches_bruteforce_jaccard(self):
        """Oracle: python sets over argsort neighbor lists, exactly the
        formulation the reference uses (evaluation.py:40-65)."""
        rng = np.random.RandomState(0)
        q = rng.randn(12, 8).astype(np.float32)
        g = rng.randn(9, 8).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        n, alpha = 5, 0.05

        got = np.asarray(k_reciprocal(jnp.array(q), jnp.array(g), n, alpha))

        qg = q @ g.T
        gg = g @ g.T
        qnn = np.argsort(-qg, axis=1)[:, :n]
        gnn = np.argsort(-gg, axis=1)[:, :n]
        want = np.zeros((12, 9))
        for i in range(12):
            for j in range(9):
                a, b = set(qnn[i].tolist()), set(gnn[j].tolist())
                want[i, j] = alpha * len(a & b) / len(a | b)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestDedupe:
    def test_first_occurrence_kept_in_order(self):
        ids = np.array([7, 3, 7, 9, 3, 1])
        keep = get_unique_indices(ids)
        np.testing.assert_array_equal(keep, [0, 1, 3, 5])
        np.testing.assert_array_equal(ids[keep], [7, 3, 9, 1])


class TestEvaluationEndToEnd:
    def _toy(self):
        rng = np.random.RandomState(1)
        n, d = 24, 16
        pids = np.repeat(np.arange(6), 4)
        # Duplicate gallery images within identity: 2 unique images per pid.
        image_ids = pids * 10 + (np.arange(n) % 2)
        centers = rng.randn(6, d).astype(np.float32) * 3
        img = centers[pids] + rng.randn(n, d).astype(np.float32) * 0.05
        txt = centers[pids] + rng.randn(n, d).astype(np.float32) * 0.05
        return img, txt, pids, image_ids

    def test_clustered_embeddings_get_perfect_rank1(self):
        img, txt, pids, image_ids = self._toy()
        res = evaluation(img, txt, pids, pids, image_ids, topk=(1, 5, 10))
        assert res["t2i"]["cmc"][0] == 100.0
        assert res["i2t"]["cmc"][0] == 100.0
        assert res["re_t2i"]["cmc"][0] == 100.0
        # gallery deduped to 12 unique image ids
        assert res["similarity"].shape == (24, 12)

    def test_rerank_changes_similarity_but_is_bounded(self):
        img, txt, pids, image_ids = self._toy()
        res = evaluation(img, txt, pids, pids, image_ids)
        # the rerank additive term is at most alpha
        assert res["re_t2i"]["mAP"] >= 0.0
        table = format_results_table(res)
        assert "re_t2i" in table and "mAP" in table

    def test_no_rerank_mode(self):
        img, txt, pids, image_ids = self._toy()
        res = evaluation(img, txt, pids, pids, image_ids, rerank=False)
        assert "re_t2i" not in res


class TestInferenceReplay:
    def test_npz_cache_replay(self, tmp_path):
        """inference() caches embeddings to inference_data.npz and replays
        them without a model pass (reference inference.py:64 +
        evaluation.py:85-95)."""
        import jax
        import jax.numpy as jnp

        from textreid_tpu.engine.inference import inference
        from textreid_tpu.models import BiGRUEncoder, TextReIDModel
        from textreid_tpu.models.m_resnet import ModifiedResNet

        rng = np.random.RandomState(0)
        n = 6
        model = TextReIDModel(
            visual=ModifiedResNet(layers=(1, 1, 1, 1), output_dim=8, heads=4,
                                  last_stride=1, input_resolution=(32, 16),
                                  width=16),
            textual=BiGRUEncoder(hidden_dim=4, vocab_size=20, embed_size=4),
            feature_size=8, num_classes=4,
        )
        batch = {
            "pixels": rng.randint(0, 255, (n, 32, 16, 3), dtype=np.uint8),
            "erase": np.zeros((n, 5), np.int32),
            "token_ids": rng.randint(1, 20, (n, 6)).astype(np.int32),
            "lengths": rng.randint(2, 6, (n,)).astype(np.int32),
            "pids": np.array([0, 0, 1, 1, 2, 2], np.int32),
            "image_ids": np.arange(n, dtype=np.int32),
            "index": np.arange(n, dtype=np.int32),
            "valid": np.ones(n, bool),
        }
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        from textreid_tpu.engine.state import TrainState

        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}), opt_state=None,
        )
        class FakeLoader(list):
            dataset = list(range(n))

        fl = FakeLoader([dict(batch)])
        out_dir = str(tmp_path)
        top1_a = inference(model, state, fl, output_folder=out_dir,
                           save_data=True, rerank=True)
        assert (tmp_path / "inference_data.npz").exists()

        # poison the model params: replay must not recompute
        bad_state = state.replace(
            params=jax.tree.map(lambda x: x * 0.0, state.params)
        )
        top1_b = inference(model, bad_state, fl, output_folder=out_dir,
                           save_data=True, rerank=True)
        assert top1_a == top1_b

    def test_reference_format_npz_replay(self, tmp_path):
        """A similarity matrix cached by the reference torch code (keys
        image_pid/text_pid/similarity/rvn_mat/rtn_mat) scores directly."""
        from textreid_tpu.engine.inference import inference

        rng = np.random.RandomState(5)
        q, g = 12, 8
        sim = rng.randn(q, g).astype(np.float32)
        text_pid = rng.randint(0, 4, q)
        image_pid = rng.randint(0, 4, g)
        np.savez(
            tmp_path / "inference_data.npz",
            image_pid=image_pid, text_pid=text_pid, similarity=sim,
            rvn_mat=np.zeros((q, g), np.float32),
            rtn_mat=np.zeros((g, q), np.float32),
        )
        top1 = inference(None, None, None, output_folder=str(tmp_path),
                         rerank=True)
        # oracle CMC@1
        best = image_pid[np.argmax(sim, axis=1)]
        want = 100.0 * np.mean(best == text_pid)
        assert abs(top1 - want) < 1e-4

    def test_our_cache_is_reference_readable(self, tmp_path):
        """The cache we write carries the reference npz keys alongside our
        embeddings, so the torch code's --load-result can replay it."""
        data = np.load(tmp_path / "noop.npz") if False else None
        # Reuse the first replay test's setup via a fresh run
        import jax
        import jax.numpy as jnp

        from textreid_tpu.engine.inference import inference
        from textreid_tpu.engine.state import TrainState
        from textreid_tpu.models import BiGRUEncoder, TextReIDModel
        from textreid_tpu.models.m_resnet import ModifiedResNet

        rng = np.random.RandomState(7)
        n = 4
        model = TextReIDModel(
            visual=ModifiedResNet(layers=(1, 1, 1, 1), output_dim=8, heads=4,
                                  last_stride=1, input_resolution=(32, 16),
                                  width=16),
            textual=BiGRUEncoder(hidden_dim=4, vocab_size=20, embed_size=4),
            feature_size=8, num_classes=4,
        )
        batch = {
            "pixels": rng.randint(0, 255, (n, 32, 16, 3), dtype=np.uint8),
            "erase": np.zeros((n, 5), np.int32),
            "token_ids": rng.randint(1, 20, (n, 6)).astype(np.int32),
            "lengths": rng.randint(2, 6, (n,)).astype(np.int32),
            "pids": np.array([0, 0, 1, 1], np.int32),
            "image_ids": np.arange(n, dtype=np.int32),
            "index": np.arange(n, dtype=np.int32),
            "valid": np.ones(n, bool),
        }
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}), opt_state=None,
        )

        class FakeLoader(list):
            dataset = list(range(n))

        inference(model, state, FakeLoader([dict(batch)]),
                  output_folder=str(tmp_path), save_data=True, rerank=True)
        saved = np.load(tmp_path / "inference_data.npz")
        for key in ("v_embed", "t_embed", "pids", "image_ids",  # ours
                    "image_pid", "text_pid", "similarity",       # reference
                    "rvn_mat", "rtn_mat"):
            assert key in saved, key
        assert saved["similarity"].shape == (n, n)


def test_map_zero_relevant_query_is_zero_not_nan():
    """The reference divides AP by num_rel unguarded (evaluation.py:33-36)
    and NaNs on a query with no relevant gallery item; we score it 0."""
    import jax.numpy as jnp

    from textreid_tpu.evaluation.metrics import rank

    sim = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    q_pids = jnp.asarray([1, 99])  # pid 99 absent from the gallery
    g_pids = jnp.asarray([1, 2])
    cmc, mean_ap, _ = rank(sim, q_pids, g_pids, topk=(1, 2))
    assert np.isfinite(float(mean_ap))
    # query 0: AP=1 (hit at rank 1); query 1: AP=0 -> mAP 50%
    np.testing.assert_allclose(float(mean_ap), 50.0, atol=1e-4)
