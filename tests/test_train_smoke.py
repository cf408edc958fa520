"""Integration smoke tests (SURVEY.md section 4.3): 2-step training on a
synthetic 8-identity dataset for both heads, MoCo queue wraparound, and
checkpoint -> resume bit-equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textreid_tpu.config import get_default_cfg
from textreid_tpu.data import make_data_loader, make_synthetic_dataset
from textreid_tpu.engine import create_train_state, make_train_step
from textreid_tpu.engine.steps import encode_step
from textreid_tpu.solver import make_lr_schedule, make_optimizer
from textreid_tpu.solver.build import set_learning_rate
from textreid_tpu.utils import Checkpointer


def tiny_cfg(root, head="moco"):
    cfg = get_default_cfg()
    cfg.ROOT = root
    cfg.DATASETS.TRAIN = ("cuhkpedes_train",)
    cfg.DATASETS.TEST = ("cuhkpedes_test",)
    cfg.INPUT.HEIGHT = 32
    cfg.INPUT.WIDTH = 16
    cfg.INPUT.USE_AUG = True
    cfg.MODEL.VISUAL_MODEL = "m_resnet50"
    cfg.MODEL.TEXTUAL_MODEL = "bigru"
    cfg.MODEL.NUM_CLASSES = 8
    cfg.MODEL.GRU.ONEHOT = "yes"
    cfg.MODEL.GRU.VOCABULARY_SIZE = 100
    cfg.MODEL.GRU.EMBEDDING_SIZE = 16
    cfg.MODEL.GRU.NUM_UNITS = 16
    cfg.MODEL.RESNET.RES5_STRIDE = 1
    cfg.MODEL.EMBEDDING.EMBED_HEAD = head
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = 32
    cfg.MODEL.EMBEDDING.EPSILON = 0.1
    cfg.MODEL.MOCO.K = 16
    cfg.MODEL.MOCO.FC = head == "moco_fc"
    if head == "moco_fc":
        cfg.MODEL.EMBEDDING.EMBED_HEAD = "moco"
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.DATALOADER.IMS_PER_ID = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.INPUT.MAX_TEXT_LENGTH = 12
    return cfg


# CLIP RN50 backbone is heavy for CPU tests; shrink it via a tiny ResNet
def small_model(cfg):
    from textreid_tpu.models import BiGRUEncoder, TextReIDModel
    from textreid_tpu.models.m_resnet import ModifiedResNet

    visual = ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=32, heads=4,
        last_stride=cfg.MODEL.RESNET.RES5_STRIDE,
        input_resolution=(cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH), width=16,
    )
    textual = BiGRUEncoder(
        hidden_dim=cfg.MODEL.GRU.NUM_UNITS,
        vocab_size=cfg.MODEL.GRU.VOCABULARY_SIZE,
        embed_size=cfg.MODEL.GRU.EMBEDDING_SIZE,
        use_onehot=cfg.MODEL.GRU.ONEHOT,
    )
    return TextReIDModel(
        visual=visual,
        textual=textual,
        feature_size=cfg.MODEL.EMBEDDING.FEATURE_SIZE,
        num_classes=cfg.MODEL.NUM_CLASSES,
        embed_head=cfg.MODEL.EMBEDDING.EMBED_HEAD,
        moco_fc=cfg.MODEL.MOCO.FC,
    )


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    ds = root / "datasets" / "cuhkpedes"
    make_synthetic_dataset(str(ds), num_identities=8, images_per_id=4,
                           image_size=(32, 16), max_tokens=12, split="train")
    make_synthetic_dataset(str(ds), num_identities=4, images_per_id=2,
                           image_size=(32, 16), max_tokens=12, split="test",
                           seed=1)
    return str(root)


def setup_training(cfg):
    model = small_model(cfg)
    loader = make_data_loader(cfg, is_train=True)
    batch = next(iter(loader))
    batch.pop("valid")
    tx = make_optimizer_for(cfg, model, batch)
    return model, loader, batch, tx


def make_optimizer_for(cfg, model, batch):
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
        jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
        method="init_all",
    )
    return make_optimizer(cfg, variables["params"])


@pytest.mark.slow
class TestMoCoTraining:
    @pytest.mark.parametrize("head", ["moco", "moco_fc"])
    def test_two_steps_losses_finite_and_queue_moves(self, synth_root, head):
        cfg = tiny_cfg(synth_root, head=head)
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        it = iter(loader)
        batch = next(it)
        batch.pop("valid")
        tx = make_optimizer_for(cfg, model, batch)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state,
                                        make_lr_schedule(cfg)(0))
        )
        step_fn = jax.jit(make_train_step(model, tx, cfg))

        state1, metrics1 = step_fn(state, batch)
        assert int(state1.queue_ptr) == 8
        for k in ("instance_loss", "infonce_loss", "global_align_loss"):
            assert np.isfinite(float(metrics1[k])), k
        # queue rows [0:8) now hold the batch ids
        np.testing.assert_array_equal(
            np.asarray(state1.id_queue[:8]), np.sort(batch["pids"])[
                np.argsort(np.argsort(batch["pids"]))]
        )
        assert (np.asarray(state1.id_queue[8:]) == -1).all()

        batch2 = next(it)
        batch2.pop("valid")
        state2, metrics2 = step_fn(state1, batch2)
        # K=16, batch 8 -> wraparound to 0 after two steps (head.py:96-109)
        assert int(state2.queue_ptr) == 0
        assert (np.asarray(state2.id_queue) != -1).all()
        assert int(state2.step) == 2

    def test_key_params_track_query_with_momentum(self, synth_root):
        cfg = tiny_cfg(synth_root)
        cfg.MODEL.MOCO.M = 0.5  # exaggerate for the test
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        batch = next(iter(loader))
        batch.pop("valid")
        tx = make_optimizer_for(cfg, model, batch)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 1e-3))
        step_fn = jax.jit(make_train_step(model, tx, cfg))
        state1, _ = step_fn(state, batch)
        # EMA ran before the optimizer update, with pre-update query params
        # equal to key params -> key params unchanged on step 1.
        k0 = jax.tree.leaves(state.key_params)[0]
        k1 = jax.tree.leaves(state1.key_params)[0]
        np.testing.assert_allclose(np.asarray(k0), np.asarray(k1), atol=1e-7)
        # after a second step they must move toward the updated query params
        state2, _ = step_fn(state1, batch)
        k2 = jax.tree.leaves(state2.key_params)[0]
        q1 = jax.tree.leaves(state1.params)[0]
        np.testing.assert_allclose(
            np.asarray(k2), 0.5 * np.asarray(k1) + 0.5 * np.asarray(q1),
            atol=1e-6,
        )


@pytest.mark.slow
class TestSimpleHeadTraining:
    def test_two_steps(self, synth_root):
        cfg = tiny_cfg(synth_root, head="simple")
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        it = iter(loader)
        batch = next(it)
        batch.pop("valid")
        tx = make_optimizer_for(cfg, model, batch)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        assert state.v_queue is None
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 1e-4))
        step_fn = jax.jit(make_train_step(model, tx, cfg))
        state, m1 = step_fn(state, batch)
        batch2 = next(it)
        batch2.pop("valid")
        state, m2 = step_fn(state, batch2)
        assert np.isfinite(float(m1["loss"]))
        assert np.isfinite(float(m2["loss"]))
        assert int(state.step) == 2


@pytest.mark.slow
class TestCheckpointRoundTrip:
    def test_save_resume_bit_equality(self, synth_root, tmp_path):
        cfg = tiny_cfg(synth_root)
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        batch = next(iter(loader))
        batch.pop("valid")
        tx = make_optimizer_for(cfg, model, batch)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 1e-4))
        step_fn = jax.jit(make_train_step(model, tx, cfg))
        state, _ = step_fn(state, batch)

        ckpt = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
        ckpt.save("epoch_1", state, epoch=1, iteration=1)

        restored, meta = ckpt.resume(str(tmp_path / "epoch_1"), state)
        assert meta == {"epoch": 1, "iteration": 1}
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # weights-only load keeps the fresh optimizer state
        fresh = create_train_state(cfg, model, tx, jax.random.PRNGKey(1), batch)
        loaded = ckpt.load(str(tmp_path / "epoch_1"), fresh)
        p_saved = jax.tree.leaves(state.params)
        p_loaded = jax.tree.leaves(loaded.params)
        for a, b in zip(p_saved, p_loaded):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(loaded.step) == int(fresh.step)

    def test_resumed_training_continues_identically(self, synth_root, tmp_path):
        cfg = tiny_cfg(synth_root)
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        it = iter(loader)
        b1 = next(it); b1.pop("valid")
        b2 = next(it); b2.pop("valid")
        tx = make_optimizer_for(cfg, model, b1)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), b1)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, 1e-4))
        step_fn = jax.jit(make_train_step(model, tx, cfg))

        s1, _ = step_fn(state, b1)
        ckpt = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
        ckpt.save("mid", s1, epoch=1)
        s2_direct, m_direct = step_fn(s1, b2)

        restored, _ = ckpt.resume(str(tmp_path / "mid"), s1)
        s2_resumed, m_resumed = step_fn(restored, b2)
        np.testing.assert_allclose(
            float(m_direct["loss"]), float(m_resumed["loss"]), rtol=1e-6
        )


class TestEncodeStep:
    def test_eval_path_shapes(self, synth_root):
        cfg = tiny_cfg(synth_root)
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        batch = next(iter(loader))
        batch.pop("valid")
        tx = make_optimizer_for(cfg, model, batch)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        v, t = encode_step(model, state, batch)
        assert v.shape == (8, 32) and t.shape == (8, 32)


@pytest.mark.slow
class TestRemat:
    def test_remat_step_matches_plain(self, synth_root):
        """TPU.REMAT recomputes the visual forward in backward; losses and
        updated params must be identical (SGD for linear-in-grad compare)."""
        cfg = tiny_cfg(synth_root)
        cfg.SOLVER.OPTIMIZER = "SGD"
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        batch = next(iter(loader))
        batch.pop("valid")
        tx = make_optimizer_for(cfg, model, batch)
        state0 = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                    batch)
        state0 = state0.replace(
            opt_state=set_learning_rate(state0.opt_state, 1e-3))

        cfg_remat = tiny_cfg(synth_root)
        cfg_remat.SOLVER.OPTIMIZER = "SGD"
        cfg_remat.TPU.REMAT = True

        s_plain, m_plain = jax.jit(make_train_step(model, tx, cfg))(
            state0, batch)
        s_remat, m_remat = jax.jit(make_train_step(model, tx, cfg_remat))(
            state0, batch)
        np.testing.assert_allclose(
            float(m_plain["loss"]), float(m_remat["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s_plain.params),
                        jax.tree.leaves(s_remat.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


@pytest.mark.slow
class TestLearning:
    def test_loss_decreases_over_training(self, synth_root):
        """End-to-end learning sanity: 30 MoCo steps on the synthetic set
        must substantially reduce the loss (gradients flow through both
        towers, the projectors, and the queue machinery)."""
        cfg = tiny_cfg(synth_root)
        cfg.MODEL.MOCO.K = 8
        cfg.SOLVER.BASE_LR = 3e-4
        model = small_model(cfg)
        loader = make_data_loader(cfg, is_train=True)
        batch0 = next(iter(loader))
        batch0.pop("valid")
        tx = make_optimizer_for(cfg, model, batch0)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch0)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 3e-4))
        step_fn = jax.jit(make_train_step(model, tx, cfg))

        losses = []
        for epoch in range(8):
            loader.set_epoch(epoch)
            for batch in loader:
                batch.pop("valid")
                state, m = step_fn(state, batch)
                losses.append(float(m["loss"]))
        first = np.mean(losses[:4])
        last = np.mean(losses[-4:])
        assert last < first * 0.8, (first, last)
        assert np.isfinite(losses).all()
