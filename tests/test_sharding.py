"""Mesh/distributed tests on the 8-device virtual CPU mesh (SURVEY.md
section 4.4): the sharded global-batch train step must match the
single-device step numerically, and the replicated MoCo queue must receive
the full global batch (the semantics the reference's per-rank DDP queues
got wrong — README.md:81, SURVEY.md section 2 parallelism table)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.config import get_default_cfg
from textreid_tpu.engine import create_train_state, make_train_step
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.m_resnet import ModifiedResNet
from textreid_tpu.parallel import (
    DATA_AXIS,
    local_batch_size,
    make_mesh,
    replicate_state,
    shard_batch,
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
    return cfg


def tiny_model(cfg):
    return TextReIDModel(
        visual=ModifiedResNet(
            layers=(1, 1, 1, 1), output_dim=32, heads=4, last_stride=1,
            input_resolution=(cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH), width=16,
        ),
        textual=BiGRUEncoder(hidden_dim=16, vocab_size=50, embed_size=16),
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


class TestMesh:
    def test_mesh_shape(self):
        mesh = make_mesh(8)
        assert mesh.shape[DATA_AXIS] == 8

    def test_local_batch_size(self):
        mesh = make_mesh(4)
        assert local_batch_size(128, mesh) == 32
        with pytest.raises(ValueError):
            local_batch_size(10, mesh)

    def test_batch_actually_sharded(self):
        mesh = make_mesh(8)
        batch = shard_batch(make_batch(8), mesh)
        shards = batch["pixels"].addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == 1


@pytest.mark.slow
class TestShardedTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        # SGD for the equivalence check: Adam's g/sqrt(g^2) normalization
        # turns reduction-order fp noise into sign flips on near-zero
        # gradients, so post-step params are only comparable under an
        # optimizer linear in the gradient.
        cfg.SOLVER.OPTIMIZER = "SGD"
        model = tiny_model(cfg)
        batch = make_batch(8)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-3))
        step = make_train_step(model, tx, cfg)
        return cfg, model, state, step, batch

    def test_sharded_step_matches_single_device(self, setup):
        cfg, model, state, step, batch = setup

        # single-device reference
        s1, m1 = jax.jit(step)(state, batch)

        # 8-way data-sharded
        mesh = make_mesh(8)
        sharded_state = replicate_state(state, mesh)
        sharded_batch = shard_batch(batch, mesh)
        s8, m8 = jax.jit(step)(sharded_state, sharded_batch)

        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(m8[k]), rtol=2e-4,
                err_msg=f"metric {k} diverged under sharding",
            )
        # queue contents identical: the global batch reached the queue
        np.testing.assert_allclose(
            np.asarray(s1.v_queue), np.asarray(s8.v_queue), atol=2e-5
        )
        np.testing.assert_array_equal(
            np.asarray(s1.id_queue), np.asarray(s8.id_queue)
        )
        # params updated identically
        p1 = jax.tree.leaves(s1.params)
        p8 = jax.tree.leaves(s8.params)
        for a, b in zip(p1, p8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5
            )

    def test_two_sharded_steps_stay_replicated(self, setup):
        cfg, model, state, step, batch = setup
        mesh = make_mesh(8)
        s = replicate_state(state, mesh)
        fn = jax.jit(step)
        s, _ = fn(s, shard_batch(batch, mesh))
        s, _ = fn(s, shard_batch(make_batch(8, seed=1), mesh))
        assert int(s.step) == 2
        assert int(s.queue_ptr) == 0  # 2*8 mod 16
        # state leaves still fully replicated across the mesh
        leaf = s.params["projection"]
        assert leaf.sharding.is_fully_replicated


class TestShardedEncode:
    def test_eval_encode_on_mesh(self):
        cfg = tiny_cfg()
        model = tiny_model(cfg)
        batch = make_batch(8)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)

        from textreid_tpu.engine.steps import encode_step

        v1, t1 = jax.jit(lambda s, b: encode_step(model, s, b))(state, batch)

        mesh = make_mesh(8)
        v8, t8 = jax.jit(lambda s, b: encode_step(model, s, b))(
            replicate_state(state, mesh), shard_batch(batch, mesh)
        )
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t8), atol=1e-5)
