"""Tensor parallelism (Megatron FFN split over the mesh `model` axis).

The reference is data-parallel only (SURVEY.md §2 parallelism table); the
`model` mesh axis here carries an opt-in FFN tensor-parallel mode for the
transformer towers (`parallel/mesh.py:shard_state`, `TPU.MODEL_PARALLEL`).
These tests run on the 8-device virtual CPU mesh and assert (a) the rules
place exactly the intended leaves, including their optax/EMA mirrors, and
(b) a dp x tp step reproduces the pure-dp step numerically — GSPMD, not the
step code, carries the split.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from textreid_tpu.config import get_default_cfg
from textreid_tpu.engine import create_train_state, make_train_step
from textreid_tpu.models import TextReIDModel
from textreid_tpu.models.text_transformer import TextTransformer
from textreid_tpu.models.vit import VisionTransformer
from textreid_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    replicate_state,
    shard_batch,
    shard_state,
)
from textreid_tpu.solver import make_optimizer
from textreid_tpu.solver.build import set_learning_rate


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 32, 16
    cfg.INPUT.MAX_TEXT_LENGTH = 10
    cfg.MODEL.NUM_CLASSES = 8
    cfg.MODEL.EMBEDDING.EMBED_HEAD = "moco"
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = 32
    cfg.MODEL.EMBEDDING.EPSILON = 0.1
    cfg.MODEL.MOCO.K = 16
    cfg.MODEL.MOCO.FC = False
    # SGD: linear in the gradient, so reduction-order fp noise stays noise
    # instead of flipping Adam sign bits (same rationale as test_sharding).
    cfg.SOLVER.OPTIMIZER = "SGD"
    return cfg


def tiny_fullclip_model(cfg):
    """ViT + CLIP-text-transformer composition — the model family whose
    TransformerBlock FFNs the tensor-parallel rules target."""
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
        embed_head="moco",
        moco_fc=False,
    )


def make_batch(batch=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixels": rng.randn(batch, 32, 16, 3).astype(np.float32),
        "token_ids": rng.randint(1, 50, (batch, 10)).astype(np.int32),
        "lengths": rng.randint(2, 10, (batch,)).astype(np.int32),
        "pids": rng.randint(0, 8, (batch,)).astype(np.int32),
    }


class TestMeshShapes:
    def test_dp_tp_mesh(self):
        mesh = make_mesh(4, 2)
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape[MODEL_AXIS] == 2

    def test_model_axis_fills_remaining_devices(self):
        mesh = make_mesh(0, 2)
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape[MODEL_AXIS] == 2

    def test_oversized_mesh_rejected(self):
        with pytest.raises(ValueError):
            make_mesh(5, 2)


@pytest.mark.slow
class TestTensorParallelStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        model = tiny_fullclip_model(cfg)
        batch = make_batch(8)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 1e-3))
        step = make_train_step(model, tx, cfg)
        return cfg, model, state, step, batch

    def _collect_specs(self, tree):
        """Map 'path/leaf' -> PartitionSpec for every sharded leaf."""
        out = {}

        def visit(path, leaf):
            names = "/".join(str(getattr(k, "name", getattr(k, "key", k)))
                             for k in path)
            out[names] = leaf.sharding.spec
            return leaf

        jax.tree_util.tree_map_with_path(visit, tree)
        return out

    def test_rules_place_ffn_leaves_everywhere(self, setup):
        _, _, state, _, _ = setup
        mesh = make_mesh(4, 2)
        sharded = shard_state(state, mesh)
        specs = self._collect_specs(sharded)

        c_fc_k = {k: v for k, v in specs.items() if k.endswith("c_fc/kernel")}
        c_fc_b = {k: v for k, v in specs.items() if k.endswith("c_fc/bias")}
        c_pr_k = {k: v for k, v in specs.items()
                  if k.endswith("c_proj/kernel")}
        # 2 towers x 2 blocks, in params AND key_params AND the SGD
        # momentum mirror (optax trace reuses param paths).
        assert len(c_fc_k) >= 8, sorted(c_fc_k)
        assert all(v == P(None, MODEL_AXIS) for v in c_fc_k.values()), c_fc_k
        assert all(v == P(MODEL_AXIS) for v in c_fc_b.values()), c_fc_b
        assert all(v == P(MODEL_AXIS, None) for v in c_pr_k.values()), c_pr_k
        # key_params (MoCo EMA towers) got the same placement
        assert any(k.startswith("key_params") for k in c_fc_k)
        # everything else replicated: queues, qkv, patch embed, scalars
        for name, spec in specs.items():
            if "c_fc" in name or "c_proj/kernel" in name:
                continue
            assert spec == P(), (name, spec)

    def test_tp_step_matches_dp_step(self, setup):
        cfg, model, state, step, batch = setup

        mesh_dp = make_mesh(8, 1)
        s_dp = replicate_state(state, mesh_dp)
        b_dp = shard_batch(dict(batch), mesh_dp)
        s_dp, m_dp = jax.jit(step)(s_dp, b_dp)

        mesh_tp = make_mesh(4, 2)
        s_tp = shard_state(state, mesh_tp)
        b_tp = shard_batch(dict(batch), mesh_tp)
        s_tp, m_tp = jax.jit(step)(s_tp, b_tp)

        for k in m_dp:
            np.testing.assert_allclose(
                float(m_dp[k]), float(m_tp[k]), rtol=2e-4, atol=2e-5,
                err_msg=f"metric {k}")

        # post-step params agree (gather the sharded ones to host)
        flat_dp = jax.tree_util.tree_leaves_with_path(s_dp.params)
        flat_tp = {tuple(str(p) for p in path): leaf
                   for path, leaf in
                   jax.tree_util.tree_leaves_with_path(s_tp.params)}
        for path, leaf in flat_dp:
            key = tuple(str(p) for p in path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_tp[key]),
                rtol=2e-4, atol=2e-5, err_msg="/".join(key))

        # queues advanced identically (global-batch MoCo under tp too)
        np.testing.assert_allclose(np.asarray(s_dp.v_queue),
                                   np.asarray(s_tp.v_queue),
                                   rtol=2e-4, atol=2e-5)

        # a second tp step runs from the donated/updated state
        s_tp2, m_tp2 = jax.jit(step)(s_tp, b_tp)
        assert np.isfinite(float(m_tp2["loss"]))

    def test_tp_eval_encode_matches(self, setup):
        cfg, model, state, _, batch = setup
        mesh = make_mesh(4, 2)
        s_tp = shard_state(state, mesh)

        def encode(s, pixels):
            return model.apply(
                {"params": s.params, "batch_stats": s.batch_stats,
                 "constants": s.constants},
                pixels, method="encode_image")

        ref = jax.jit(encode)(state, jnp.asarray(batch["pixels"]))
        got = jax.jit(encode)(s_tp, shard_batch(
            {"pixels": batch["pixels"]}, mesh)["pixels"])
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=2e-4, atol=2e-5)


class TestNoSilentDowngrade:
    def test_non_transformer_model_rejected_on_tp_mesh(self):
        """A model-parallel mesh with a model that has no FFN leaves to
        shard must refuse loudly (model-axis devices would duplicate work
        for zero speedup)."""
        from textreid_tpu.models import BiGRUEncoder
        from textreid_tpu.models.m_resnet import ModifiedResNet

        cfg = tiny_cfg()
        model = TextReIDModel(
            visual=ModifiedResNet(
                layers=(1, 1, 1, 1), output_dim=32, heads=4, last_stride=1,
                input_resolution=(32, 16), width=16,
            ),
            textual=BiGRUEncoder(hidden_dim=16, vocab_size=50,
                                 embed_size=16),
            feature_size=32, num_classes=8, embed_head="moco", moco_fc=False,
        )
        batch = make_batch(8)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch)
        with pytest.raises(ValueError, match="no state leaf matches"):
            shard_state(state, make_mesh(4, 2))


@pytest.mark.slow
class TestTPFusedAttentionComposition:
    def test_tp_sharded_params_through_fused_attention_tower(self):
        """FFN tensor parallelism composes with the Pallas attention
        kernel's own partitioning rule (batch-factor-only,
        ops/attention_pallas.py): attention params stay replicated, FFN
        params are model-sharded, and the tower output matches the
        unsharded XLA-attention forward."""
        from jax.sharding import NamedSharding
        from textreid_tpu.parallel.mesh import tp_spec

        vit = VisionTransformer(
            input_resolution=(32, 16), patch_size=8, width=32, layers=2,
            heads=4, output_dim=32,
        )
        vit_fused = VisionTransformer(
            input_resolution=(32, 16), patch_size=8, width=32, layers=2,
            heads=4, output_dim=32, fused_attention=True,
            attn_interpret=True,
        )
        rng = np.random.RandomState(0)
        pixels = jnp.asarray(rng.randn(8, 32, 16, 3).astype(np.float32))
        variables = vit.init(jax.random.PRNGKey(0), pixels)
        ref = jax.jit(vit.apply)(variables, pixels)

        mesh = make_mesh(4, 2)
        sharded_vars = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(
                x, NamedSharding(mesh, tp_spec(p, x))), variables)
        ffn = sharded_vars["params"]["block_0"]["c_fc"]["kernel"]
        assert MODEL_AXIS in tuple(ffn.sharding.spec)
        px = shard_batch({"pixels": np.asarray(pixels)}, mesh)["pixels"]
        got = jax.jit(vit_fused.apply)(sharded_vars, px)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=2e-4, atol=2e-5)
