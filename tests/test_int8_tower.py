"""int8-dataflow visual tower (models/int8_tower.py): the folded float
graph must reproduce the model's eval forward, and the int8 graph must
agree with it to quantization error — embedding cosine >= 0.999 is the
serving gate measured on-chip (BENCH_STAGES)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.engine.state import TrainState
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.int8_tower import (
    build_int8_encoder,
    calibrate_amax,
    int8_trunk_apply,
    prepare_int8_tower,
    _folded_trunk_float,
)
from textreid_tpu.models.m_resnet import ModifiedResNet


@pytest.fixture(scope="module")
def tower_setup():
    """A small but real ModifiedResNet (all four stages, strides, one
    stride-1 tail like RES5_STRIDE=1) with random init."""
    visual = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=4,
                            last_stride=1, input_resolution=(64, 32),
                            width=16)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(2, 64, 32, 3).astype(np.float32))
    variables = visual.init(jax.random.PRNGKey(0), pixels)
    # move batch_stats off their init values (mean 0 / var 1) the real
    # way — train-mode forwards — so BN folding is exercised without
    # producing a ReLU-dead tower (arbitrary stat perturbations do)
    stats = variables["batch_stats"]
    for seed in (1, 2):
        xb = jnp.asarray(
            np.random.RandomState(seed).randn(4, 64, 32, 3)
            .astype(np.float32) * 0.5)
        _, mutated = visual.apply(
            {"params": variables["params"], "batch_stats": stats},
            xb, train=True, mutable=["batch_stats"])
        stats = mutated["batch_stats"]
    return visual, variables["params"], stats


def _norm_batch(n=4, seed=3, shape=(64, 32)):
    rng = np.random.RandomState(seed)
    return rng.randn(n, *shape, 3).astype(np.float32) * 0.5


class TestFoldedFloatGraph:
    def test_matches_model_eval_forward(self, tower_setup):
        """BN folding is exact algebra: the folded float trunk must equal
        the flax eval-mode forward (up to the attention pool, which the
        folded graph stops before) to f32 roundoff."""
        visual, params, stats = tower_setup
        x = jnp.asarray(_norm_batch())

        # flax forward up to the pool: run the full model then compare via
        # a trunk-only module clone? Simpler: recompute the pool on the
        # folded features and compare final outputs.
        want = visual.apply({"params": params, "batch_stats": stats}, x,
                            train=False)
        feat = _folded_trunk_float(visual, params, stats, x, None)
        from textreid_tpu.models.m_resnet import AttentionPool2d

        pool = AttentionPool2d(spacial_dim=visual.final_grid,
                               embed_dim=visual.width * 32,
                               num_heads=visual.heads,
                               output_dim=visual.output_dim)
        got = pool.apply({"params": params["attnpool"]},
                         feat.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_calibration_records_every_conv_site(self, tower_setup):
        visual, params, stats = tower_setup
        amax = calibrate_amax(visual, params, stats, [_norm_batch(2)],
                              (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
        sites = set(amax)
        assert {"conv1", "conv2", "conv3"} <= sites
        for stage, blocks in zip(range(1, 5), (1, 1, 1, 1)):
            for b in range(blocks):
                for c in ("conv1", "conv2", "conv3"):
                    assert f"layer{stage}_{b}.{c}" in sites
        # per-channel vectors, matching each conv's input width
        assert amax["conv1"].shape == (3,)
        assert amax["layer1_0.conv2"].shape == (16,)

    def test_calibration_accumulates_max_across_batches(self, tower_setup):
        visual, params, stats = tower_setup
        b1, b2 = _norm_batch(2, seed=5), _norm_batch(2, seed=6) * 2.0
        a_each = [calibrate_amax(visual, params, stats, [b],
                                 (0.5,) * 3, (0.25,) * 3) for b in (b1, b2)]
        a_both = calibrate_amax(visual, params, stats, [b1, b2],
                                (0.5,) * 3, (0.25,) * 3)
        for site in a_both:
            np.testing.assert_allclose(
                a_both[site], np.maximum(a_each[0][site], a_each[1][site]),
                rtol=1e-6)


class TestInt8Trunk:
    def test_agrees_with_float_trunk(self, tower_setup):
        visual, params, stats = tower_setup
        calib = _norm_batch(4, seed=7)
        amax = calibrate_amax(visual, params, stats, [calib],
                              (0.5,) * 3, (0.25,) * 3)
        tower = prepare_int8_tower(visual, params, stats, amax)
        x = jnp.asarray(_norm_batch(4, seed=8))
        want = np.asarray(_folded_trunk_float(visual, params, stats, x,
                                              None))
        got = np.asarray(int8_trunk_apply(visual, tower, x))
        assert got.shape == want.shape
        w = want.reshape(want.shape[0], -1)
        g = got.reshape(got.shape[0], -1)
        cos = (w * g).sum(1) / (
            np.linalg.norm(w, axis=1) * np.linalg.norm(g, axis=1) + 1e-12)
        assert cos.min() > 0.995, cos

    def test_mixed_precision_front_agrees(self, tower_setup):
        """float_blocks keeps the stem + first N blocks in folded bf16;
        the mixed graph must agree with the float trunk at least as well
        as the all-int8 one (fewer quantized edges)."""
        visual, params, stats = tower_setup
        calib = _norm_batch(4, seed=7)
        amax = calibrate_amax(visual, params, stats, [calib],
                              (0.5,) * 3, (0.25,) * 3)
        x = jnp.asarray(_norm_batch(4, seed=8))
        want = np.asarray(_folded_trunk_float(visual, params, stats, x,
                                              None))

        def min_cos(got):
            w = want.reshape(want.shape[0], -1)
            g = got.reshape(got.shape[0], -1)
            return ((w * g).sum(1) / (np.linalg.norm(w, axis=1)
                                      * np.linalg.norm(g, axis=1)
                                      + 1e-12)).min()

        tower_all = prepare_int8_tower(visual, params, stats, amax)
        cos_all = min_cos(np.asarray(int8_trunk_apply(visual, tower_all,
                                                      x)))
        tower_mixed = prepare_int8_tower(visual, params, stats, amax,
                                         float_blocks=2)
        got = np.asarray(int8_trunk_apply(visual, tower_mixed, x,
                                          float_blocks=2))
        cos_mixed = min_cos(got)
        assert cos_mixed > 0.995
        assert cos_mixed >= cos_all - 5e-4, (cos_mixed, cos_all)
        # float-block units store bf16 kernels, int8 region stays int8
        assert tower_mixed.units["layer1_0.conv2"]["w"].dtype == \
            jnp.bfloat16
        assert tower_mixed.units["layer4_0.conv2"]["w_q"].dtype == jnp.int8

    def test_inter_conv_tensors_are_int8(self, tower_setup):
        """The capability claim: what the graph materializes between convs
        is int8 (weights int8, activations quantized per edge)."""
        visual, params, stats = tower_setup
        amax = calibrate_amax(visual, params, stats, [_norm_batch(2)],
                              (0.5,) * 3, (0.25,) * 3)
        tower = prepare_int8_tower(visual, params, stats, amax)
        for name, u in tower.units.items():
            assert u["w_q"].dtype == jnp.int8, name
            assert u["s_w"].dtype == jnp.float32
        jaxpr = jax.make_jaxpr(
            lambda t, x: int8_trunk_apply(visual, t, x)
        )(tower, jnp.zeros((1, 64, 32, 3), jnp.float32))
        convs = [e for e in jaxpr.jaxpr.eqns
                 if e.primitive.name == "conv_general_dilated"]
        assert len(convs) == len(tower.units)
        for e in convs:
            assert e.invars[0].aval.dtype == jnp.int8, "activation not int8"
            assert e.invars[1].aval.dtype == jnp.int8, "kernel not int8"
            assert e.outvars[0].aval.dtype == jnp.int32, "no int32 accum"


class TestServingEncoder:
    @pytest.fixture(scope="class")
    def model_and_state(self):
        model = TextReIDModel(
            visual=ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32,
                                  heads=4, last_stride=1,
                                  input_resolution=(64, 32), width=16),
            textual=BiGRUEncoder(hidden_dim=8, vocab_size=30, embed_size=8),
            feature_size=16, num_classes=4,
        )
        rng = np.random.RandomState(0)
        pixels = jnp.asarray(
            rng.randint(0, 255, (2, 64, 32, 3), dtype=np.uint8))
        ids = jnp.asarray(rng.randint(1, 30, (2, 8)).astype(np.int32))
        lens = jnp.asarray([8, 4], dtype=jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), pixels, ids, lens,
                               method="init_all")
        # settle batch_stats on the input distribution (train-mode
        # forwards), as a trained checkpoint's stats would be — untouched
        # init stats (mean 0 / var 1) mis-scale every BN and make the
        # agreement bound meaningless
        stats = variables["batch_stats"]
        for seed in (1, 2, 3):
            xb = jnp.asarray(np.random.RandomState(seed).randint(
                0, 255, (4, 64, 32, 3), dtype=np.uint8))
            _, mutated = model.apply(
                {"params": variables["params"], "batch_stats": stats},
                xb, train=True, erase=None, method="encode_image",
                mutable=["batch_stats"])
            stats = mutated["batch_stats"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=stats,
            constants=variables.get("constants", {}), opt_state=None,
        )
        return model, state

    def test_embeddings_cosine_vs_float(self, model_and_state):
        model, state = model_and_state
        rng = np.random.RandomState(11)
        calib = rng.randint(0, 255, (4, 64, 32, 3), dtype=np.uint8)
        encode, tower = build_int8_encoder(model, state, [calib])
        pixels = jnp.asarray(
            rng.randint(0, 255, (4, 64, 32, 3), dtype=np.uint8))
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
        cos = (got * want).sum(axis=1)  # both normalized
        assert cos.min() > 0.999, cos

    def test_prenormalized_float_input_matches_uint8(self, model_and_state):
        """f32 input means already-normalized pixels (the encode_image
        convention, model.py:146); the int8 encoder must not re-normalize
        them — double normalization lands far outside the calibrated
        activation ranges (code-review round 4)."""
        model, state = model_and_state
        rng = np.random.RandomState(12)
        calib = rng.randint(0, 255, (4, 64, 32, 3), dtype=np.uint8)
        encode, tower = build_int8_encoder(model, state, [calib])
        pixels_u8 = jnp.asarray(
            rng.randint(0, 255, (4, 64, 32, 3), dtype=np.uint8))
        erase = jnp.zeros((4, 5), jnp.int32)

        from textreid_tpu.models.model import preprocess_pixels

        pixels_f32 = preprocess_pixels(pixels_u8, None, model.pixel_mean,
                                       model.pixel_std, jnp.float32)
        got_u8 = np.asarray(encode(state, tower, pixels_u8, erase))
        got_f32 = np.asarray(encode(state, tower, pixels_f32, erase))
        np.testing.assert_allclose(got_u8, got_f32, atol=1e-5)

    def test_rejects_non_mresnet(self, model_and_state):
        model, state = model_and_state
        from textreid_tpu.models.resnet import ResNet

        bad = model.clone(visual=ResNet(block="basic", layers=(2, 2, 2, 2)))
        with pytest.raises(NotImplementedError):
            build_int8_encoder(bad, state, [np.zeros((1, 64, 32, 3),
                                                     np.uint8)])
