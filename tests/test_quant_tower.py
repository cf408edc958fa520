"""int8 visual-tower inference tests: conv-level error bounds, interceptor
end-to-end agreement with the float tower, serving integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from textreid_tpu.engine.state import TrainState
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.m_resnet import ModifiedResNet
from textreid_tpu.models.quant_tower import (
    int8_conv,
    int8_conv_interceptor,
    int8_image_encoder,
)
from textreid_tpu.serving import RetrievalIndex


class TestInt8Conv:
    def test_error_bounded_vs_float_conv(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
        got = int8_conv(x, w, (1, 1), [(1, 1), (1, 1)])
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
        )
        # two 8-bit quantization steps: ~1% relative error each, summed
        # over the 3*3*16 contraction
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want)))
        assert err < 0.03 * scale, (err, scale)

    def test_strided_conv(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.2)
        got = int8_conv(x, w, (2, 2), [(1, 1), (1, 1)])
        want = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
        )
        assert got.shape == want.shape
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 0.03 * float(jnp.max(jnp.abs(want)))

    def test_int8_values_are_exactly_representable(self):
        """Inputs already on the int8 grid must round-trip exactly (the
        quantizer must not add error where none is needed)."""
        x = jnp.asarray(
            np.arange(-127, 128, dtype=np.float32).reshape(1, 1, 255, 1))
        w = jnp.ones((1, 1, 1, 1), jnp.float32) * 127.0
        got = int8_conv(x, w, (1, 1), [(0, 0), (0, 0)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(x) * 127.0,
                                   rtol=1e-6)


class TestInt8Dense:
    def test_error_bounded_vs_float_dense(self):
        from textreid_tpu.models.quant_tower import int8_dense

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(4, 9, 64).astype(np.float32))
        w = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
        got = int8_dense(x, w, b)
        want = x @ w + b
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 0.03 * float(jnp.max(jnp.abs(want))), err

    def test_vit_tower_agreement(self):
        """int8 Dense through the full ViT tower: embeddings must stay
        close to the float forward (per-layer ~1% quantization noise
        through 12 residual blocks)."""
        from textreid_tpu.models.quant_tower import int8_dense_interceptor
        from textreid_tpu.models.vit import VisionTransformer

        vit = VisionTransformer(input_resolution=(32, 16), patch_size=8,
                                width=64, layers=3, heads=4, output_dim=32)
        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.rand(2, 32, 16, 3).astype(np.float32))
        v = vit.init(jax.random.PRNGKey(0), x)
        want = np.asarray(vit.apply(v, x), np.float32)
        with nn.intercept_methods(int8_dense_interceptor(min_out_features=64)):
            got = np.asarray(vit.apply(v, x), np.float32)
        cos = np.sum(want * got, axis=-1) / (
            np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1))
        assert (cos > 0.99).all(), cos


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


class TestInterceptedTower:
    def test_interceptor_changes_conv_path_only(self, model_and_state):
        """The intercepted forward must stay close to the float forward
        (per-conv ~1% quantization noise through the tower)."""
        model, state = model_and_state
        rng = np.random.RandomState(3)
        pixels = jnp.asarray(
            rng.randint(0, 255, (4, 32, 16, 3), dtype=np.uint8))
        erase = jnp.zeros((4, 5), jnp.int32)
        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "constants": state.constants}
        want = model.apply(variables, pixels, erase=erase,
                           method="encode_image")
        with nn.intercept_methods(int8_conv_interceptor()):
            got = model.apply(variables, pixels, erase=erase,
                              method="encode_image")
        w = np.asarray(want, np.float32)
        g = np.asarray(got, np.float32)
        cos = np.sum(w * g, axis=-1) / (
            np.linalg.norm(w, axis=-1) * np.linalg.norm(g, axis=-1))
        assert (cos > 0.99).all(), cos

    def test_encoder_embeddings_agree_with_float(self, model_and_state):
        model, state = model_and_state
        rng = np.random.RandomState(4)
        pixels = jnp.asarray(
            rng.randint(0, 255, (4, 32, 16, 3), dtype=np.uint8))
        erase = jnp.zeros((4, 5), jnp.int32)
        encode = int8_image_encoder(model, state)
        got = np.asarray(encode(state, pixels, erase))
        # float reference embedding via the serving encoder math
        from textreid_tpu.models.losses import l2_normalize

        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "constants": state.constants}
        feat = model.apply(variables, pixels, erase=erase,
                           method="encode_image")
        emb = model.apply({"params": state.params}, feat,
                          method="embed_image")
        want = np.asarray(l2_normalize(emb.astype(jnp.float32), axis=1))
        cos = np.sum(got * want, axis=1)  # both L2-normalized
        assert (cos > 0.99).all(), cos


class TestServingIntegration:
    def test_int8_encode_index_agrees_with_float(self, model_and_state):
        model, state = model_and_state
        rng = np.random.RandomState(5)
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]
        f_idx = RetrievalIndex(model, state, use_pallas=False)
        q_idx = RetrievalIndex(model, state, use_pallas=False,
                               int8_encode=True)
        f_idx.build_gallery(batches, meta=np.arange(10))
        q_idx.build_gallery(batches, meta=np.arange(10))
        token_ids = rng.randint(1, 30, (4, 8)).astype(np.int32)
        lengths = np.full(4, 8, np.int32)
        # k = full gallery so every item's score is visible to the checks
        fs, fm = f_idx.search(token_ids, lengths, k=10)
        qs, qm = q_idx.search(token_ids, lengths, k=10)
        # scores must agree within the accumulated conv quantization error
        order = np.argsort(fm, axis=1)
        np.testing.assert_allclose(
            np.take_along_axis(fs, order, axis=1),
            np.take_along_axis(qs, np.argsort(qm, axis=1), axis=1),
            atol=0.05,
        )
        # a rank-1 flip is only legitimate between float-score near-ties
        # (this tiny random model's gallery clusters tightly; a real tower
        # separates identities by far more than the quantization noise)
        for r in range(4):
            if fm[r, 0] != qm[r, 0]:
                flip_score = fs[r][fm[r] == qm[r, 0]][0]
                assert fs[r, 0] - flip_score < 0.02, (r, fs[r], fm[r])

    def test_int8_encode_serves_image_queries(self, model_and_state):
        """search_by_image must route through the CALIBRATED int8-dataflow
        encoder after build_gallery swaps it in: a gallery image queried
        back re-encodes to (near) the same embedding and ranks itself
        first."""
        model, state = model_and_state
        rng = np.random.RandomState(6)
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]
        idx = RetrievalIndex(model, state, use_pallas=False,
                             int8_encode=True, image_query_batch=4)
        idx.build_gallery(batches, meta=np.arange(100, 110))
        queries = np.concatenate(batches)[[1, 6]]
        scores, meta = idx.search_by_image(queries, k=3)
        # int8 encode is deterministic: query embedding == gallery row
        np.testing.assert_array_equal(meta[:, 0], [101, 106])
        np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-3)
