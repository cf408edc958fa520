"""int8-dataflow ViT encoder (models/int8_vit.py): the LN-affine-folded
float graph must reproduce the module's eval forward, and the int8 graph
must agree to quantization error — embedding cosine >= 0.999 is the
serving gate measured on-chip (BENCH_STAGES vit_fwd_int8_dataflow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.engine.state import TrainState
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.int8_vit import (
    _folded_vit_float,
    build_int8_vit_encoder,
    calibrate_vit_amax,
    int8_vit_apply,
    prepare_int8_vit,
)
from textreid_tpu.models.vit import VisionTransformer


@pytest.fixture(scope="module")
def vit_setup():
    """A small but real ViT (2 layers, 4 heads) with random init, f32 so
    the folded-float agreement bound is roundoff, not bf16 noise."""
    vit = VisionTransformer(input_resolution=(32, 16), patch_size=8,
                            width=32, layers=2, heads=4, output_dim=16,
                            dtype=jnp.float32)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(2, 32, 16, 3).astype(np.float32))
    params = vit.init(jax.random.PRNGKey(0), pixels)["params"]
    return vit, params


def _norm_batch(n=4, seed=3, shape=(32, 16)):
    rng = np.random.RandomState(seed)
    return rng.randn(n, *shape, 3).astype(np.float32) * 0.5


class TestFoldedFloatGraph:
    def test_matches_module_eval_forward(self, vit_setup):
        """LN-affine folding is exact algebra: the folded float graph must
        equal the flax forward to f32 roundoff."""
        vit, params = vit_setup
        x = jnp.asarray(_norm_batch())
        want = vit.apply({"params": params}, x)
        got = _folded_vit_float(vit, params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_calibration_records_every_matmul_site(self, vit_setup):
        vit, params = vit_setup
        amax = calibrate_vit_amax(vit, params, [_norm_batch(2)],
                                  (0.5,) * 3, (0.25,) * 3)
        sites = set(amax)
        assert "patch" in sites
        for i in range(vit.layers):
            for s in ("qkv", "out_proj", "c_fc", "c_proj"):
                assert f"block_{i}.{s}" in sites
        assert amax["patch"].shape == (3,)
        assert amax["block_0.qkv"].shape == (vit.width,)
        assert amax["block_0.c_proj"].shape == (4 * vit.width,)

    def test_calibration_accumulates_max_across_batches(self, vit_setup):
        vit, params = vit_setup
        b1, b2 = _norm_batch(2, seed=5), _norm_batch(2, seed=6) * 2.0
        a_each = [calibrate_vit_amax(vit, params, [b], (0.5,) * 3,
                                     (0.25,) * 3) for b in (b1, b2)]
        a_both = calibrate_vit_amax(vit, params, [b1, b2], (0.5,) * 3,
                                    (0.25,) * 3)
        for site in a_both:
            np.testing.assert_allclose(
                a_both[site], np.maximum(a_each[0][site], a_each[1][site]),
                rtol=1e-6)


class TestInt8Graph:
    def test_agrees_with_float_forward(self, vit_setup):
        vit, params = vit_setup
        calib = _norm_batch(4, seed=7)
        amax = calibrate_vit_amax(vit, params, [calib], (0.5,) * 3,
                                  (0.25,) * 3)
        tower = prepare_int8_vit(vit, params, amax)
        x = jnp.asarray(_norm_batch(4, seed=8))
        want = np.asarray(vit.apply({"params": params}, x), np.float32)
        got = np.asarray(int8_vit_apply(vit, tower, x), np.float32)
        cos = (want * got).sum(axis=1) / (
            np.linalg.norm(want, axis=1) * np.linalg.norm(got, axis=1)
            + 1e-12)
        assert cos.min() > 0.999, cos

    def test_block_matmul_inputs_are_int8(self, vit_setup):
        """The dataflow claim itself: every block matmul consumes int8
        (checked in the jaxpr — dot_general/conv ops whose lhs is s8)."""
        vit, params = vit_setup
        amax = calibrate_vit_amax(vit, params, [_norm_batch(2, seed=9)],
                                  (0.5,) * 3, (0.25,) * 3)
        tower = prepare_int8_vit(vit, params, amax)
        x = jnp.asarray(_norm_batch(2, seed=10))
        jaxpr = jax.make_jaxpr(
            lambda t, x: int8_vit_apply(vit, t, x))(tower, x)
        int8_dots = [
            e for e in jaxpr.jaxpr.eqns
            if e.primitive.name in ("dot_general", "conv_general_dilated")
            and e.invars[0].aval.dtype == jnp.int8
        ]
        # patch conv + 4 matmuls per block
        assert len(int8_dots) == 1 + 4 * vit.layers, len(int8_dots)

    def test_weight_quantization_folds_ln_affine(self, vit_setup):
        """Sites fed by a LayerNorm fold gamma into the kernel and
        beta @ W into the bias; plain sites fold only the input scale."""
        vit, params = vit_setup
        amax = calibrate_vit_amax(vit, params, [_norm_batch(2, seed=11)],
                                  (0.5,) * 3, (0.25,) * 3)
        tower = prepare_int8_vit(vit, params, amax)
        bp = params["block_0"]
        u = tower.units["block_0.qkv"]
        w = np.asarray(bp["qkv"]["kernel"], np.float32)
        g = np.asarray(bp["ln_1"]["scale"], np.float32)
        beta = np.asarray(bp["ln_1"]["bias"], np.float32)
        s_in = np.asarray(tower.scales["block_0.qkv"], np.float32)
        w_eff = (g * s_in)[:, None] * w
        np.testing.assert_allclose(
            np.asarray(u["w_q"], np.float32) * np.asarray(u["s_w"]),
            w_eff, atol=np.abs(w_eff).max() / 100)
        np.testing.assert_allclose(
            np.asarray(u["b"]),
            beta @ w + np.asarray(bp["qkv"]["bias"], np.float32),
            rtol=1e-5, atol=1e-6)


class TestServingEncoder:
    @pytest.fixture(scope="class")
    def model_and_state(self):
        model = TextReIDModel(
            visual=VisionTransformer(input_resolution=(32, 16),
                                     patch_size=8, width=32, layers=2,
                                     heads=4, output_dim=16,
                                     dtype=jnp.float32),
            textual=BiGRUEncoder(hidden_dim=8, vocab_size=30, embed_size=8),
            feature_size=16, num_classes=4,
        )
        rng = np.random.RandomState(0)
        pixels = jnp.asarray(
            rng.randint(0, 255, (2, 32, 16, 3), dtype=np.uint8))
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

    def test_embeddings_cosine_vs_float(self, model_and_state):
        model, state = model_and_state
        rng = np.random.RandomState(11)
        calib = rng.randint(0, 255, (4, 32, 16, 3), dtype=np.uint8)
        encode, tower = build_int8_vit_encoder(model, state, [calib])
        pixels = jnp.asarray(
            rng.randint(0, 255, (4, 32, 16, 3), dtype=np.uint8))
        erase = jnp.zeros((4, 5), jnp.int32)
        got = np.asarray(encode(state, tower, pixels, erase))

        from textreid_tpu.models.losses import l2_normalize

        feat = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "constants": state.constants},
            pixels, erase=erase, method="encode_image")
        want = np.asarray(l2_normalize(
            model.apply({"params": state.params}, feat,
                        method="embed_image").astype(jnp.float32), axis=1))
        cos = (got * want).sum(axis=1)
        assert cos.min() > 0.999, cos

    def test_rejects_non_vit_tower(self, model_and_state):
        from textreid_tpu.models.m_resnet import ModifiedResNet

        model, state = model_and_state
        bad = model.clone(visual=ModifiedResNet(
            layers=(1, 1, 1, 1), output_dim=16, heads=4, last_stride=1,
            input_resolution=(64, 32), width=16))
        with pytest.raises(NotImplementedError, match="VisionTransformer"):
            build_int8_vit_encoder(bad, state, [np.zeros((1, 64, 32, 3),
                                                         np.uint8)])

    def test_retrieval_index_routes_dataflow_to_int8_vit(
            self, model_and_state):
        """RetrievalIndex(int8_encode=True) on a ViT tower must take the
        int8-dataflow pend path (not the conv interceptor) and swap in the
        int8_vit encoder during build_gallery; the built index must agree
        with the float index on the same gallery."""
        from textreid_tpu.serving import RetrievalIndex

        model, state = model_and_state
        rng = np.random.RandomState(13)
        batches = [rng.randint(0, 255, (5, 32, 16, 3), dtype=np.uint8)
                   for _ in range(2)]

        idx8 = RetrievalIndex(model, state, query_batch=4,
                              use_pallas=False, int8_encode=True)
        assert idx8._int8_pending  # dataflow path chosen, not interceptor
        idx8.build_gallery(batches, meta=np.arange(10))
        assert not idx8._int8_pending

        idxf = RetrievalIndex(model, state, query_batch=4,
                              use_pallas=False)
        idxf.build_gallery(batches, meta=np.arange(10))
        g8 = np.asarray(idx8.gallery, np.float32)
        gf = np.asarray(idxf.gallery, np.float32)
        cos = (g8 * gf).sum(axis=1)  # both rows L2-normalized
        assert cos.min() > 0.999, cos
