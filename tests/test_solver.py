"""Solver tests: all 5 LR schedule modes against a torch oracle built from
the published update rules, bias/weight param-group semantics, and the
torch-Adam-equivalence of the optax chain (SURVEY.md section 4.1)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from textreid_tpu.config import get_default_cfg
from textreid_tpu.solver import bias_mask, make_lr_schedule, make_optimizer
from textreid_tpu.solver.build import set_learning_rate


def _cfg(**solver):
    cfg = get_default_cfg()
    for k, v in solver.items():
        cfg.SOLVER[k] = v
    return cfg


class TestLRSchedule:
    def test_step_mode_with_warmup(self):
        cfg = _cfg(
            BASE_LR=1e-4, LRSCHEDULER="step", STEPS=(40, 70), GAMMA=0.1,
            WARMUP_FACTOR=0.1, WARMUP_EPOCHS=5, WARMUP_METHOD="linear",
            NUM_EPOCHS=80,
        )
        sched = make_lr_schedule(cfg)
        # epoch 0: warmup factor = 0.1*(1-0)+0 = 0.1
        assert np.isclose(sched(0), 1e-5)
        # linear ramp: epoch 4 -> 0.1*(1-0.8)+0.8 = 0.82
        assert np.isclose(sched(4), 1e-4 * 0.82)
        # after warmup, before first milestone
        assert np.isclose(sched(5), 1e-4)
        assert np.isclose(sched(39), 1e-4)
        assert np.isclose(sched(40), 1e-5)
        assert np.isclose(sched(69), 1e-5)
        assert np.isclose(sched(70), 1e-6)
        assert np.isclose(sched(79), 1e-6)

    @pytest.mark.parametrize("mode", ["exp", "poly", "cosine", "linear"])
    def test_continuous_modes(self, mode):
        cfg = _cfg(
            BASE_LR=2e-4, LRSCHEDULER=mode, WARMUP_EPOCHS=10,
            WARMUP_FACTOR=1 / 3, NUM_EPOCHS=100, TARGET_LR=1e-5, POWER=0.9,
        )
        sched = make_lr_schedule(cfg)
        base, target, power = 2e-4, 1e-5, 0.9
        for epoch in [10, 37, 55, 99]:
            ratio = (epoch - 10) / 90
            if mode == "exp":
                want = base * power**ratio
            elif mode == "linear":
                want = base * (1 - ratio)
            elif mode == "poly":
                want = target + (base - target) * power ** (1 - ratio)
            else:
                want = target + (base - target) * 0.5 * (1 + np.cos(np.pi * ratio))
            assert np.isclose(sched(epoch), want), (mode, epoch)

    def test_constant_warmup(self):
        cfg = _cfg(WARMUP_METHOD="constant", WARMUP_FACTOR=0.25, WARMUP_EPOCHS=3,
                   BASE_LR=1e-3)
        sched = make_lr_schedule(cfg)
        for e in range(3):
            assert np.isclose(sched(e), 2.5e-4)

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError):
            make_lr_schedule(_cfg(LRSCHEDULER="bogus"))


class TestBiasMask:
    def test_masks_bias_leaves(self):
        params = {
            "Dense_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
            "BatchNorm_0": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
        }
        mask = bias_mask(params)
        assert mask["Dense_0"]["bias"] is True
        assert mask["Dense_0"]["kernel"] is False
        assert mask["BatchNorm_0"]["bias"] is True
        assert mask["BatchNorm_0"]["scale"] is False


class TestOptimizerTorchParity:
    def test_adam_with_coupled_l2_and_bias_groups(self):
        """Run 5 steps of our optax chain vs torch.optim.Adam with the
        reference's param groups (bias: lr x2, wd 0; other: wd 4e-5)."""
        rng = np.random.RandomState(0)
        w0 = rng.randn(4, 3).astype(np.float32)
        b0 = rng.randn(3).astype(np.float32)
        lr, wd = 1e-2, 4e-5

        # torch side
        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
        opt = torch.optim.Adam(
            [
                {"params": [wt], "lr": lr, "weight_decay": wd},
                {"params": [bt], "lr": lr * 2, "weight_decay": 0.0},
            ],
            lr=lr, betas=(0.9, 0.999), eps=1e-8,
        )

        # jax side
        params = {"layer": {"kernel": jnp.array(w0), "bias": jnp.array(b0)}}
        cfg = _cfg(OPTIMIZER="Adam", BASE_LR=lr, BIAS_LR_FACTOR=2,
                   WEIGHT_DECAY=wd, WEIGHT_DECAY_BIAS=0.0)
        tx = make_optimizer(cfg, params)
        opt_state = tx.init(params)
        opt_state = set_learning_rate(opt_state, lr)

        for step in range(5):
            gw = rng.randn(4, 3).astype(np.float32)
            gb = rng.randn(3).astype(np.float32)

            opt.zero_grad()
            wt.grad = torch.from_numpy(gw.copy())
            bt.grad = torch.from_numpy(gb.copy())
            opt.step()

            grads = {"layer": {"kernel": jnp.array(gw), "bias": jnp.array(gb)}}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        np.testing.assert_allclose(
            np.asarray(params["layer"]["kernel"]), wt.detach().numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(params["layer"]["bias"]), bt.detach().numpy(), atol=1e-6
        )

    def test_learning_rate_injection(self):
        params = {"w": jnp.ones((2, 2))}
        cfg = _cfg(OPTIMIZER="Adam", BASE_LR=1.0, WEIGHT_DECAY=0.0)
        tx = make_optimizer(cfg, params)
        state = tx.init(params)
        grads = {"w": jnp.ones((2, 2))}

        state_a = set_learning_rate(state, 0.5)
        upd_a, _ = tx.update(grads, state_a, params)
        state_b = set_learning_rate(state, 0.05)
        upd_b, _ = tx.update(grads, state_b, params)
        ratio = np.asarray(upd_a["w"]) / np.asarray(upd_b["w"])
        np.testing.assert_allclose(ratio, 10.0, rtol=1e-5)

    def test_visual_lr_factor_scales_only_visual_tower(self):
        """SOLVER.VISUAL_LR_FACTOR (the ViT fine-tune recipe knob) must
        scale updates under the top-level 'visual' tower and nothing else."""
        params = {"visual": {"block_0": {"kernel": jnp.ones((2, 2))}},
                  "textual": {"kernel": jnp.ones((2, 2))},
                  "projection": jnp.ones((2, 2))}
        grads = jax.tree.map(jnp.ones_like, params)

        def updates(factor):
            cfg = _cfg(OPTIMIZER="Adam", BASE_LR=1.0, WEIGHT_DECAY=0.0,
                       VISUAL_LR_FACTOR=factor)
            tx = make_optimizer(cfg, params)
            state = set_learning_rate(tx.init(params), 1.0)
            upd, _ = tx.update(grads, state, params)
            return upd

        base, scaled = updates(1.0), updates(0.1)
        np.testing.assert_allclose(
            np.asarray(scaled["visual"]["block_0"]["kernel"]),
            np.asarray(base["visual"]["block_0"]["kernel"]) * 0.1, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(scaled["textual"]["kernel"]),
                                   np.asarray(base["textual"]["kernel"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(scaled["projection"]),
                                   np.asarray(base["projection"]), rtol=1e-6)

    def test_frozen_mask_zeroes_updates(self):
        params = {"a": jnp.ones(3), "b": jnp.ones(3)}
        cfg = _cfg(OPTIMIZER="Adam", BASE_LR=0.1, WEIGHT_DECAY=0.0)
        trainable = {"a": True, "b": False}
        tx = make_optimizer(cfg, params, trainable_mask=trainable)
        state = tx.init(params)
        state = set_learning_rate(state, 0.1)
        grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
        updates, _ = tx.update(grads, state, params)
        assert np.abs(np.asarray(updates["a"])).max() > 0
        np.testing.assert_array_equal(np.asarray(updates["b"]), 0.0)


class TestFreezeMask:
    def test_freezes_stem_early_layers_and_text_tower(self):
        from textreid_tpu.solver import freeze_mask

        params = {
            "visual": {
                "conv1": {"kernel": jnp.ones(1)},
                "bn2": {"scale": jnp.ones(1)},
                "layer1_0": {"conv1": {"kernel": jnp.ones(1)}},
                "layer3_5": {"bn1": {"bias": jnp.ones(1)}},
                "layer4_0": {"conv1": {"kernel": jnp.ones(1)}},
                "attnpool": {"q_proj": {"kernel": jnp.ones(1)}},
            },
            "textual": {"fwd_w_ih_l0": jnp.ones(1)},
            "v_embed_layer": {"kernel": jnp.ones(1)},
            "projection": jnp.ones(1),
        }
        m = freeze_mask(params)
        assert m["visual"]["conv1"]["kernel"] is False
        assert m["visual"]["bn2"]["scale"] is False
        assert m["visual"]["layer1_0"]["conv1"]["kernel"] is False
        assert m["visual"]["layer3_5"]["bn1"]["bias"] is False
        assert m["visual"]["layer4_0"]["conv1"]["kernel"] is True  # res5 trains
        assert m["visual"]["attnpool"]["q_proj"]["kernel"] is True
        assert m["textual"]["fwd_w_ih_l0"] is False
        assert m["v_embed_layer"]["kernel"] is True
        assert m["projection"] is True

    def test_freeze_zeroes_updates_through_optimizer(self):
        from textreid_tpu.solver import freeze_mask

        params = {
            "visual": {"conv1": {"kernel": jnp.ones(3)},
                       "layer4_0": {"kernel": jnp.ones(3)}},
            "textual": {"w": jnp.ones(3)},
        }
        cfg = _cfg(OPTIMIZER="Adam", BASE_LR=0.1, WEIGHT_DECAY=0.0)
        tx = make_optimizer(cfg, params, freeze_mask(params))
        state = set_learning_rate(tx.init(params), 0.1)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_array_equal(
            np.asarray(updates["visual"]["conv1"]["kernel"]), 0.0)
        np.testing.assert_array_equal(np.asarray(updates["textual"]["w"]), 0.0)
        assert np.abs(np.asarray(updates["visual"]["layer4_0"]["kernel"])).max() > 0
