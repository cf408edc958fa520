"""int8-dataflow CLIP text transformer (models/int8_text.py): the
LN-affine-folded float graph must reproduce the module's eval forward,
the int8 graph must agree to quantization error, and the serving swap
(RetrievalIndex.enable_int8_text) must keep search results consistent
with the float tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.engine.state import TrainState
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.int8_text import (
    _folded_text_float,
    build_int8_text_encoder,
    calibrate_text_amax,
    int8_text_apply,
    prepare_int8_text,
)
from textreid_tpu.models.text_transformer import TextTransformer
from textreid_tpu.models.vit import VisionTransformer

VOCAB, CTX, WIDTH, LAYERS, HEADS, OUT = 50, 12, 32, 2, 4, 16


@pytest.fixture(scope="module")
def text_setup():
    """A small but real text transformer with random init, f32 so the
    folded-float agreement bound is roundoff, not bf16 noise."""
    tt = TextTransformer(vocab_size=VOCAB, context_length=CTX, width=WIDTH,
                         layers=LAYERS, heads=HEADS, output_dim=OUT,
                         dtype=jnp.float32)
    ids, lens = _tokens(2, seed=0)
    params = tt.init(jax.random.PRNGKey(0), ids, lens)["params"]
    return tt, params


def _tokens(n=4, seed=3, seq=CTX, min_len=3):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, VOCAB, (n, seq)).astype(np.int32)
    lens = rng.randint(min_len, seq + 1, (n,)).astype(np.int32)
    for row, ln in enumerate(lens):  # zero-pad past lengths like the loader
        ids[row, ln:] = 0
    return jnp.asarray(ids), jnp.asarray(lens)


class TestFoldedFloatGraph:
    def test_matches_module_eval_forward(self, text_setup):
        """LN-affine folding is exact algebra: the folded float graph must
        equal the flax forward to f32 roundoff."""
        tt, params = text_setup
        ids, lens = _tokens(4, seed=1)
        want = tt.apply({"params": params}, ids, lens)
        got = _folded_text_float(tt, params, ids, lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_calibration_records_every_matmul_site(self, text_setup):
        tt, params = text_setup
        amax = calibrate_text_amax(tt, params, [_tokens(2, seed=2)])
        sites = set(amax)
        for i in range(tt.layers):
            for s in ("qkv", "out_proj", "c_fc", "c_proj"):
                assert f"block_{i}.{s}" in sites
        assert amax["block_0.qkv"].shape == (WIDTH,)
        assert amax["block_0.c_proj"].shape == (4 * WIDTH,)

    def test_calibration_accumulates_max_across_batches(self, text_setup):
        tt, params = text_setup
        b1, b2 = _tokens(2, seed=5), _tokens(2, seed=6)
        a_each = [calibrate_text_amax(tt, params, [b]) for b in (b1, b2)]
        a_both = calibrate_text_amax(tt, params, [b1, b2])
        for site in a_both:
            np.testing.assert_allclose(
                a_both[site], np.maximum(a_each[0][site], a_each[1][site]),
                rtol=1e-6)


class TestInt8Graph:
    def test_agrees_with_float_forward(self, text_setup):
        tt, params = text_setup
        amax = calibrate_text_amax(tt, params, [_tokens(8, seed=7)])
        tower = prepare_int8_text(tt, params, amax)
        ids, lens = _tokens(4, seed=8)
        want = np.asarray(tt.apply({"params": params}, ids, lens),
                          np.float32)
        got = np.asarray(int8_text_apply(tt, tower, ids, lens), np.float32)
        cos = (want * got).sum(axis=1) / (
            np.linalg.norm(want, axis=1) * np.linalg.norm(got, axis=1)
            + 1e-12)
        assert cos.min() > 0.999, cos

    def test_block_matmul_inputs_are_int8(self, text_setup):
        """The dataflow claim itself: every block matmul consumes int8
        (checked in the jaxpr — dot_generals whose lhs is s8)."""
        tt, params = text_setup
        amax = calibrate_text_amax(tt, params, [_tokens(2, seed=9)])
        tower = prepare_int8_text(tt, params, amax)
        ids, lens = _tokens(2, seed=10)
        jaxpr = jax.make_jaxpr(
            lambda t, i, l: int8_text_apply(tt, t, i, l))(tower, ids, lens)
        int8_dots = [
            e for e in jaxpr.jaxpr.eqns
            if e.primitive.name == "dot_general"
            and e.invars[0].aval.dtype == jnp.int8
        ]
        assert len(int8_dots) == 4 * tt.layers, len(int8_dots)

    def test_padding_invariance(self, text_setup):
        """Garbage in pad slots past ``lengths`` must not move the
        embedding: causal masking keeps pads out of valid positions'
        attention, and the dynamic requant scale is per-token — the same
        invariance the float tower guarantees
        (models/text_transformer.py:20-26)."""
        tt, params = text_setup
        amax = calibrate_text_amax(tt, params, [_tokens(4, seed=11)])
        tower = prepare_int8_text(tt, params, amax)
        ids, lens = _tokens(3, seed=12, min_len=3)
        lens = jnp.minimum(lens, CTX - 2)  # guarantee >= 2 pad slots
        base = np.asarray(int8_text_apply(tt, tower, ids, lens))
        scrambled = np.asarray(ids).copy()
        rng = np.random.RandomState(13)
        for row, ln in enumerate(np.asarray(lens)):
            scrambled[row, ln:] = rng.randint(1, VOCAB, CTX - ln)
        got = np.asarray(int8_text_apply(tt, tower,
                                         jnp.asarray(scrambled), lens))
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)


class TestServingEncoder:
    @pytest.fixture(scope="class")
    def model_and_state(self):
        model = TextReIDModel(
            visual=VisionTransformer(input_resolution=(32, 16),
                                     patch_size=8, width=32, layers=2,
                                     heads=4, output_dim=16,
                                     dtype=jnp.float32),
            textual=TextTransformer(vocab_size=VOCAB, context_length=CTX,
                                    width=WIDTH, layers=LAYERS, heads=HEADS,
                                    output_dim=16, dtype=jnp.float32),
            feature_size=16, num_classes=4,
        )
        rng = np.random.RandomState(0)
        pixels = jnp.asarray(
            rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8))
        ids, lens = _tokens(2, seed=0)
        variables = model.init(jax.random.PRNGKey(0), pixels, ids, lens,
                               method="init_all")
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}), opt_state=None,
        )
        return model, state

    def test_embeddings_cosine_vs_float(self, model_and_state):
        model, state = model_and_state
        encode, tower = build_int8_text_encoder(model, state,
                                                [_tokens(8, seed=21)])
        ids, lens = _tokens(4, seed=22)
        got = np.asarray(encode(state, tower, ids, lens))

        from textreid_tpu.models.losses import l2_normalize

        feat = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "constants": state.constants},
            ids, lens, method="encode_text")
        want = np.asarray(l2_normalize(
            model.apply({"params": state.params}, feat,
                        method="embed_text").astype(jnp.float32), axis=1))
        cos = (got * want).sum(axis=1)
        assert cos.min() > 0.999, cos

    def test_rejects_gru_tower(self, model_and_state):
        model, state = model_and_state
        bad = model.clone(textual=BiGRUEncoder(hidden_dim=8, vocab_size=30,
                                               embed_size=8))
        with pytest.raises(NotImplementedError, match="TextTransformer"):
            build_int8_text_encoder(bad, state, [_tokens(2, seed=23)])

    def test_retrieval_index_enable_int8_text(self, model_and_state):
        """enable_int8_text must swap the fused search path onto the int8
        graph (tower rides as a jit argument) and keep top-k results
        consistent with the float tower on the same gallery."""
        from textreid_tpu.serving import RetrievalIndex

        model, state = model_and_state
        rng = np.random.RandomState(31)
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]

        idx = RetrievalIndex(model, state, query_batch=4, use_pallas=False)
        idx.build_gallery(batches, meta=np.arange(10))
        ids, lens = _tokens(3, seed=32)
        vals_f, meta_f = idx.search(np.asarray(ids), np.asarray(lens), k=5)
        emb_f = idx.encode_queries(np.asarray(ids), np.asarray(lens))

        assert idx._text_tower is None
        idx.enable_int8_text([_tokens(8, seed=33)])
        assert idx._text_tower is not None
        vals_8, meta_8 = idx.search(np.asarray(ids), np.asarray(lens), k=5)
        emb_8 = idx.encode_queries(np.asarray(ids), np.asarray(lens))

        # embeddings agree to quantization error -> identical ranking on
        # a well-separated random gallery
        cos = (emb_f * emb_8).sum(axis=1)
        assert cos.min() > 0.999, cos
        np.testing.assert_array_equal(meta_8, meta_f)
        np.testing.assert_allclose(vals_8, vals_f, atol=0.02)

    def test_int8_text_composes_with_quantized_gallery(self,
                                                       model_and_state):
        """int8 text encode + int8 gallery scoring: the _fused_quant
        program must accept the tower argument and agree with the float
        pipeline's ranking."""
        from textreid_tpu.serving import RetrievalIndex

        model, state = model_and_state
        rng = np.random.RandomState(51)
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]

        idxf = RetrievalIndex(model, state, query_batch=4,
                              use_pallas=False)
        idxf.build_gallery(batches, meta=np.arange(10))
        idx = RetrievalIndex(model, state, query_batch=4, use_pallas=False,
                             quantize=True)
        idx.build_gallery(batches, meta=np.arange(10))
        idx.enable_int8_text([_tokens(8, seed=52)])
        ids, lens = _tokens(3, seed=53)
        vals_f, meta_f = idxf.search(np.asarray(ids), np.asarray(lens),
                                     k=5)
        vals_8, meta_8 = idx.search(np.asarray(ids), np.asarray(lens), k=5)
        np.testing.assert_array_equal(meta_8, meta_f)
        np.testing.assert_allclose(vals_8, vals_f, atol=0.03)

    def test_enable_int8_text_rejects_gru(self, model_and_state):
        from textreid_tpu.serving import RetrievalIndex

        model, state = model_and_state
        bad = model.clone(textual=BiGRUEncoder(hidden_dim=8, vocab_size=30,
                                               embed_size=8))
        rng = np.random.RandomState(41)
        pixels = jnp.asarray(
            rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8))
        ids = jnp.asarray(rng.randint(1, 30, (2, 8)).astype(np.int32))
        lens = jnp.asarray([8, 4], dtype=jnp.int32)
        variables = bad.init(jax.random.PRNGKey(0), pixels, ids, lens,
                             method="init_all")
        bstate = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}), opt_state=None,
        )
        idx = RetrievalIndex(bad, bstate, query_batch=4, use_pallas=False)
        with pytest.raises(NotImplementedError, match="TextTransformer"):
            idx.enable_int8_text([_tokens(2, seed=42)])
