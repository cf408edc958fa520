"""Gradient-cache microbatched training (SOLVER.GRAD_ACCUM_STEPS).

The claim under test (engine/grad_cache.py): splitting the batch into M
sequentially-scanned microbatches changes NOTHING about the objective —
the batch-contrastive losses (global_align, MoCo InfoNCE with the global
same-identity queue mask) are computed over the full batch's embeddings
and the parameter gradients match the single-pass step.  For
LayerNorm-only towers (ViT + CLIP text transformer) that equality is
exact up to reduction-order float noise, which is what these tests
assert; BatchNorm towers (documented delta) get smoke + bookkeeping
coverage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.config import get_default_cfg
from textreid_tpu.engine import create_train_state, make_train_step
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.m_resnet import ModifiedResNet
from textreid_tpu.models.text_transformer import TextTransformer
from textreid_tpu.models.vit import VisionTransformer
from textreid_tpu.solver import make_optimizer
from textreid_tpu.solver.build import set_learning_rate


def tiny_cfg(head="moco", accum=1):
    cfg = get_default_cfg()
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 32, 16
    cfg.MODEL.NUM_CLASSES = 8
    cfg.MODEL.EMBEDDING.EMBED_HEAD = head
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = 32
    cfg.MODEL.EMBEDDING.EPSILON = 0.1
    cfg.MODEL.MOCO.K = 16
    cfg.MODEL.MOCO.FC = False
    cfg.SOLVER.GRAD_ACCUM_STEPS = accum
    # SGD: linear in the gradient, so reduction-order fp noise stays noise
    # instead of flipping Adam sign bits (same rationale as test_sharding).
    cfg.SOLVER.OPTIMIZER = "SGD"
    return cfg


def tiny_fullclip_model(cfg):
    """LayerNorm-only towers: microbatch statistics cannot differ from
    full-batch statistics, so grad-cache must reproduce the single-pass
    step numerically."""
    return TextReIDModel(
        visual=VisionTransformer(
            input_resolution=(cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH),
            patch_size=8, width=32, layers=2, heads=4, output_dim=32,
        ),
        textual=TextTransformer(
            vocab_size=50, context_length=10, width=32, layers=2, heads=4,
            output_dim=32,
        ),
        feature_size=cfg.MODEL.EMBEDDING.FEATURE_SIZE,
        num_classes=cfg.MODEL.NUM_CLASSES,
        embed_head=cfg.MODEL.EMBEDDING.EMBED_HEAD,
        moco_fc=cfg.MODEL.MOCO.FC,
    )


def tiny_bn_model(cfg):
    """BatchNorm visual tower + bi-GRU (the flagship family)."""
    return TextReIDModel(
        visual=ModifiedResNet(
            layers=(1, 1, 1, 1), output_dim=32, heads=4, last_stride=1,
            input_resolution=(cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH), width=16,
        ),
        textual=BiGRUEncoder(hidden_dim=16, vocab_size=50, embed_size=16,
                             use_onehot="yes"),
        feature_size=cfg.MODEL.EMBEDDING.FEATURE_SIZE,
        num_classes=cfg.MODEL.NUM_CLASSES,
        embed_head=cfg.MODEL.EMBEDDING.EMBED_HEAD,
        moco_fc=cfg.MODEL.MOCO.FC,
    )


def make_batch(batch=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixels": rng.randn(batch, 32, 16, 3).astype(np.float32),
        "token_ids": rng.randint(1, 50, (batch, 10)).astype(np.int32),
        "lengths": rng.randint(2, 10, (batch,)).astype(np.int32),
        "pids": rng.randint(0, 8, (batch,)).astype(np.int32),
    }


def build(cfg, model_fn, batch):
    model = model_fn(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
        jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
        method="init_all",
    )
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-3))
    return model, tx, state


def _leaf_diffs(a, b):
    return [
        (jax.tree_util.keystr(path), float(jnp.max(jnp.abs(x - y))))
        for (path, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(a),
            jax.tree_util.tree_leaves_with_path(b),
        )
    ]


class TestExactVsSinglePass:
    """accum=M must reproduce the accum=1 step on LayerNorm-only towers."""

    @pytest.mark.parametrize("head,accum", [("moco", 2), ("moco", 4),
                                            ("simple", 2)])
    def test_params_and_metrics_match(self, head, accum):
        batch = make_batch(8)
        cfg1 = tiny_cfg(head=head, accum=1)
        model, tx, state = build(cfg1, tiny_fullclip_model, batch)

        s1, m1 = jax.jit(make_train_step(model, tx, cfg1))(state, batch)
        cfgM = tiny_cfg(head=head, accum=accum)
        sM, mM = jax.jit(make_train_step(model, tx, cfgM))(state, batch)

        # identical batch-level objective (global queue mask, all-pairs
        # global_align) -> identical loss values
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(mM[k]),
                                       rtol=1e-5, err_msg=f"metric {k}")
        # identical parameter updates up to summation-order noise
        for name, d in _leaf_diffs(s1.params, sM.params):
            assert d < 1e-5, (name, d)
        if head == "moco":
            for name, d in _leaf_diffs(s1.key_params, sM.key_params):
                assert d < 1e-6, (name, d)
            np.testing.assert_allclose(np.asarray(s1.v_queue),
                                       np.asarray(sM.v_queue), atol=1e-5)
            np.testing.assert_allclose(np.asarray(s1.t_queue),
                                       np.asarray(sM.t_queue), atol=1e-5)
            assert int(s1.queue_ptr) == int(sM.queue_ptr)
            np.testing.assert_array_equal(np.asarray(s1.id_queue),
                                          np.asarray(sM.id_queue))

    def test_moco_fc_projection_heads(self):
        """FC=True routes queries through the momentum projection heads;
        the cached cotangents must cover that branch too."""
        batch = make_batch(8)
        cfg1 = tiny_cfg(head="moco", accum=1)
        cfg1.MODEL.MOCO.FC = True
        model, tx, state = build(cfg1, tiny_fullclip_model, batch)
        s1, m1 = jax.jit(make_train_step(model, tx, cfg1))(state, batch)

        cfg2 = tiny_cfg(head="moco", accum=2)
        cfg2.MODEL.MOCO.FC = True
        s2, m2 = jax.jit(make_train_step(model, tx, cfg2))(state, batch)

        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5)
        for name, d in _leaf_diffs(s1.params, s2.params):
            assert d < 1e-5, (name, d)


class TestBatchNorm:
    def test_bn_tower_trains_and_bookkeeps(self):
        batch = make_batch(8)
        cfg = tiny_cfg(head="moco", accum=2)
        model, tx, state = build(cfg, tiny_bn_model, batch)
        new_state, metrics = jax.jit(make_train_step(model, tx, cfg))(
            state, batch)

        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        assert int(new_state.queue_ptr) == 8 % cfg.MODEL.MOCO.K
        # the full batch was enqueued at the old pointer in order
        np.testing.assert_array_equal(
            np.asarray(new_state.id_queue[:8]), batch["pids"])
        # BN running stats moved
        diffs = _leaf_diffs(state.batch_stats, new_state.batch_stats)
        assert any(d > 0 for _, d in diffs)
        # params updated everywhere
        assert all(d > 0 for _, d in _leaf_diffs(
            state.params, new_state.params))


class TestValidation:
    def test_indivisible_batch_rejected(self):
        batch = make_batch(8)
        cfg = tiny_cfg(head="moco", accum=3)
        model, tx, state = build(cfg, tiny_fullclip_model, batch)
        with pytest.raises(ValueError, match="GRAD_ACCUM_STEPS"):
            jax.jit(make_train_step(model, tx, cfg))(state, batch)


@pytest.mark.slow
class TestMesh:
    def test_grad_cache_matches_single_pass_on_dp_mesh(self):
        """Data-parallel mesh: the microbatch scan runs per-chip over the
        sharded batch axis; GSPMD inserts the same collectives as the
        single-pass step and the result matches."""
        from textreid_tpu.parallel import make_mesh, replicate_state, \
            shard_batch

        batch = make_batch(8)
        cfg1 = tiny_cfg(head="moco", accum=1)
        model, tx, state = build(cfg1, tiny_fullclip_model, batch)
        mesh = make_mesh(8, 1)
        s0 = replicate_state(state, mesh)
        b = shard_batch(dict(batch), mesh)

        s1, m1 = jax.jit(make_train_step(model, tx, cfg1))(s0, b)
        cfg2 = tiny_cfg(head="moco", accum=2)
        s2, m2 = jax.jit(make_train_step(model, tx, cfg2))(s0, b)

        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"metric {k}")
        for name, d in _leaf_diffs(s1.params, s2.params):
            assert d < 1e-4, (name, d)

    def test_grad_cache_composes_with_tensor_parallelism(self):
        """dp x tp mesh with the FFN leaves live-sharded over `model`:
        the microbatch scan and the Megatron split are orthogonal."""
        from textreid_tpu.parallel import MODEL_AXIS, make_mesh, \
            shard_batch, shard_state

        batch = make_batch(8)
        cfg1 = tiny_cfg(head="moco", accum=1)
        model, tx, state = build(cfg1, tiny_fullclip_model, batch)
        mesh = make_mesh(4, 2)
        s0 = shard_state(state, mesh)
        ffn = s0.params["visual"]["block_0"]["c_fc"]["kernel"]
        assert MODEL_AXIS in tuple(ffn.sharding.spec)
        b = shard_batch(dict(batch), mesh)

        s1, m1 = jax.jit(make_train_step(model, tx, cfg1))(s0, b)
        cfg2 = tiny_cfg(head="moco", accum=2)
        s2, m2 = jax.jit(make_train_step(model, tx, cfg2))(s0, b)

        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"metric {k}")
        for name, d in _leaf_diffs(s1.params, s2.params):
            assert d < 1e-4, (name, d)
