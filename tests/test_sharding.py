"""Mesh/distributed tests on the 8-device virtual CPU mesh (SURVEY.md
section 4.4): the sharded global-batch train step must match the
single-device step numerically, and the replicated MoCo queue must receive
the full global batch (the semantics the reference's per-rank DDP queues
got wrong — README.md:81, SURVEY.md section 2 parallelism table)."""

import re

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


class TestMultiSliceMesh:
    """Hierarchical (slice, data, model) mesh — SURVEY §5.8's "ICI within
    a slice, DCN across slices" layout.  The load-bearing property is
    device ORDER: each slice's chips occupy the inner mesh axes
    contiguously, so collectives naming `data` group within-slice device
    sets (ICI) and only `slice` collectives cross the DCN boundary."""

    def test_axes_and_slice_major_device_order(self):
        from textreid_tpu.parallel import SLICE_AXIS, data_shard_count

        mesh = make_mesh(num_slices=2)
        assert mesh.axis_names == (SLICE_AXIS, DATA_AXIS, "model")
        assert mesh.shape[SLICE_AXIS] == 2
        assert mesh.shape[DATA_AXIS] == 4
        assert data_shard_count(mesh) == 8
        devs = list(jax.devices())
        # slice s owns a contiguous block of devices (virtual-mesh
        # grouping; real hardware groups by slice_index instead)
        for s in range(2):
            got = [d.id for d in mesh.devices[s].flatten()]
            want = [d.id for d in devs[s * 4:(s + 1) * 4]]
            assert got == want

    def test_batch_shards_over_both_axes(self):
        from textreid_tpu.parallel import batch_sharding

        mesh = make_mesh(num_slices=2)
        batch = shard_batch(make_batch(16), mesh)
        assert len(batch["pixels"].addressable_shards) == 8
        assert batch["pixels"].addressable_shards[0].data.shape[0] == 2
        spec = batch_sharding(mesh).spec
        assert tuple(spec) == (("slice", "data"),)
        assert local_batch_size(16, mesh) == 2

    def test_data_collectives_group_within_slice(self):
        """A psum over `data` must produce replica groups that are the
        within-slice device sets ({0..3},{4..7}) — the assertion that the
        reduce rides ICI; a psum over `slice` pairs across slices."""
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from textreid_tpu.parallel import SLICE_AXIS

        mesh = make_mesh(num_slices=2)
        x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)

        def groups_of(axis, out_spec):
            f = shard_map(
                lambda v: jax.lax.psum(v, axis), mesh=mesh,
                in_specs=P((SLICE_AXIS, DATA_AXIS), None),
                out_specs=out_spec)
            hlo = jax.jit(f).lower(x).compile().as_text()
            m = re.findall(r"replica_groups=\{(\{[\d,\{\} ]*\})\}", hlo)
            assert m, f"no explicit replica_groups in HLO:\n{hlo[:2000]}"
            return {
                tuple(int(t) for t in g.split(","))
                for g in re.findall(r"\{([\d, ]+)\}", m[0])
            }

        within = groups_of(DATA_AXIS, P(SLICE_AXIS, None))
        assert within == {(0, 1, 2, 3), (4, 5, 6, 7)}
        across = groups_of(SLICE_AXIS, P(DATA_AXIS, None))
        assert across == {(0, 4), (1, 5), (2, 6), (3, 7)}

    def test_sharded_step_matches_flat_mesh(self):
        """The hierarchical mesh is numerically a pure relabeling of the
        flat data mesh: one SGD train step lands identical params."""
        cfg = tiny_cfg()
        cfg.SOLVER.OPTIMIZER = "SGD"
        model = tiny_model(cfg)
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

        outs = []
        for mesh in (make_mesh(8), make_mesh(num_slices=2)):
            st = replicate_state(state, mesh)
            sb = shard_batch(make_batch(8), mesh)
            # no donation: replicate_state may alias the host state's
            # buffers across both loop iterations
            with mesh:
                new_state, metrics = jax.jit(step)(st, sb)
            outs.append((jax.device_get(new_state.params),
                         float(metrics["loss"])))
        (p_flat, l_flat), (p_hier, l_hier) = outs
        assert l_flat == pytest.approx(l_hier, rel=1e-6)
        flat_leaves = jax.tree_util.tree_leaves(p_flat)
        hier_leaves = jax.tree_util.tree_leaves(p_hier)
        for a, b in zip(flat_leaves, hier_leaves):
            np.testing.assert_allclose(a, b, atol=1e-6)


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
