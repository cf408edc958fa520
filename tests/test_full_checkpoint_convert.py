"""End-to-end conversion of a full reference-model checkpoint (MoCo head):
reference torch key naming -> TrainState pieces -> working encode.

Validates the contract that released TextReID ``.pth`` checkpoints load via
``convert_textreid_checkpoint`` (SURVEY.md section 5.4): key/query encoder
trees, embed layers, loss projection, and the [D,K] -> [K,D] queue
transposition with id queue and pointer."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from textreid_tpu.config import get_default_cfg
from textreid_tpu.engine import create_train_state, make_train_step
from textreid_tpu.engine.steps import encode_step
from textreid_tpu.models import BiGRUEncoder, TextReIDModel
from textreid_tpu.models.m_resnet import ModifiedResNet
from textreid_tpu.solver import make_optimizer
from textreid_tpu.utils.weight_convert import (
    convert_textreid_checkpoint,
    merge_pretrained,
)
from tests.test_weight_convert import _rand_m_resnet_sd

RNG = np.random.RandomState(0)

WIDTH, OUT_DIM, FEAT, HID, EMB, K = 8, 24, 16, 6, 8, 8
LAYERS = (3, 4, 6, 3)  # RN50 block counts (tiny width)


def _gru_sd(prefix):
    sd = {}
    for suffix in ("", "_reverse"):
        sd[f"{prefix}gru.weight_ih_l0{suffix}"] = RNG.randn(
            3 * HID, EMB).astype(np.float32) * 0.2
        sd[f"{prefix}gru.weight_hh_l0{suffix}"] = RNG.randn(
            3 * HID, HID).astype(np.float32) * 0.2
    return sd


def _dense_sd(prefix, out_d, in_d):
    return {
        f"{prefix}.weight": RNG.randn(out_d, in_d).astype(np.float32) * 0.1,
        f"{prefix}.bias": RNG.randn(out_d).astype(np.float32) * 0.1,
    }


def make_reference_checkpoint():
    sd = {}
    for tower_prefix in ("visual_model.", "embed_model.v_encoder_k."):
        for k, v in _rand_m_resnet_sd(LAYERS, WIDTH, OUT_DIM).items():
            sd[tower_prefix + k] = v
    sd.update(_gru_sd("textual_model."))
    sd.update(_gru_sd("embed_model.t_encoder_k."))
    sd.update(_dense_sd("embed_model.v_embed_layer", FEAT, OUT_DIM))
    sd.update(_dense_sd("embed_model.t_embed_layer", FEAT, 2 * HID))
    sd["embed_model.loss_evaluator.projection"] = RNG.randn(
        FEAT, 11).astype(np.float32)
    v_queue = RNG.rand(FEAT, K).astype(np.float32)
    t_queue = RNG.rand(FEAT, K).astype(np.float32)
    sd["embed_model.v_queue"] = v_queue
    sd["embed_model.t_queue"] = t_queue
    sd["embed_model.id_queue"] = np.arange(K, dtype=np.int64).reshape(1, K)
    sd["embed_model.queue_ptr"] = np.array([4], np.int64)
    return sd


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.VISUAL_MODEL = "m_resnet50"
    cfg.MODEL.TEXTUAL_MODEL = "bigru"
    cfg.MODEL.GRU.ONEHOT = "clip_vit"
    cfg.MODEL.GRU.VOCABULARY_SIZE = 40
    cfg.MODEL.GRU.EMBEDDING_SIZE = EMB
    cfg.MODEL.GRU.NUM_UNITS = HID
    cfg.MODEL.RESNET.RES5_STRIDE = 1
    cfg.MODEL.EMBEDDING.EMBED_HEAD = "moco"
    cfg.MODEL.EMBEDDING.FEATURE_SIZE = FEAT
    cfg.MODEL.MOCO.FC = False
    cfg.MODEL.MOCO.K = K
    cfg.MODEL.NUM_CLASSES = 11
    cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 32, 16
    cfg.INPUT.MAX_TEXT_LENGTH = 10
    return cfg


def tiny_model(cfg):
    return TextReIDModel(
        visual=ModifiedResNet(
            layers=LAYERS, output_dim=OUT_DIM, heads=4, last_stride=1,
            input_resolution=(32, 16), width=WIDTH,
        ),
        textual=BiGRUEncoder(
            hidden_dim=HID, vocab_size=40, embed_size=EMB,
            use_onehot="clip_vit", allow_random_table=True,
        ),
        feature_size=FEAT, num_classes=11, embed_head="moco", moco_fc=False,
    )


@pytest.mark.slow
class TestFullCheckpointConversion:
    def test_convert_and_encode(self):
        cfg = tiny_cfg()
        sd = make_reference_checkpoint()
        converted = convert_textreid_checkpoint(sd, cfg)

        # queue layout: reference [D, K] -> ours [K, D]
        np.testing.assert_allclose(
            converted["v_queue"], sd["embed_model.v_queue"].T
        )
        assert converted["id_queue"].shape == (K,)
        assert converted["queue_ptr"] == 4
        assert "visual" in converted["key_params"]
        assert "textual" in converted["key_params"]

        model = tiny_model(cfg)
        rng = np.random.RandomState(1)
        batch = {
            "pixels": rng.randint(0, 255, (4, 32, 16, 3), dtype=np.uint8),
            "erase": np.zeros((4, 5), np.int32),
            "token_ids": rng.randint(1, 40, (4, 10)).astype(np.int32),
            "lengths": rng.randint(2, 10, (4,)).astype(np.int32),
            "pids": rng.randint(0, 11, (4,)).astype(np.int32),
        }
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)

        merged = merge_pretrained(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"params": converted["params"],
             "batch_stats": converted["batch_stats"]},
        )
        kmerged = merge_pretrained(
            {"params": state.key_params,
             "batch_stats": state.key_batch_stats},
            {"params": converted["key_params"],
             "batch_stats": converted["key_batch_stats"]},
        )
        state = state.replace(
            params=merged["params"], batch_stats=merged["batch_stats"],
            key_params=kmerged["params"],
            key_batch_stats=kmerged["batch_stats"],
            v_queue=jnp.asarray(converted["v_queue"]),
            t_queue=jnp.asarray(converted["t_queue"]),
            id_queue=jnp.asarray(converted["id_queue"]),
            queue_ptr=jnp.asarray(converted["queue_ptr"]),
        )

        # loaded weights actually took effect
        got = np.asarray(state.params["v_embed_layer"]["kernel"])
        np.testing.assert_allclose(
            got, sd["embed_model.v_embed_layer.weight"].T, atol=0
        )
        # and the model runs end-to-end with them
        v, t = encode_step(model, state, batch)
        assert v.shape == (4, FEAT) and t.shape == (4, FEAT)
        assert np.isfinite(np.asarray(v)).all()
        assert np.isfinite(np.asarray(t)).all()

        # resumed training from the converted state also works
        step = jax.jit(make_train_step(model, tx, cfg))
        from textreid_tpu.solver.build import set_learning_rate

        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, 1e-4))
        new_state, metrics = step(state, batch)
        assert int(new_state.queue_ptr) == (4 + 4) % K
        assert np.isfinite(float(metrics["loss"]))


class TestFullModelNumericParity:
    def test_eval_embeddings_match_torch_oracle(self):
        """Strongest conversion evidence available without the released
        files: the complete eval path (uint8 preprocess -> CLIP-RN trunk ->
        attention pool -> embed layer; tokens -> bi-GRU -> max-pool -> embed
        layer) of a converted reference checkpoint must match the same
        pipeline recomputed with torch functional ops."""
        import torch
        import torch.nn.functional as TF

        from tests.test_m_resnet_parity import (
            torch_attnpool,
            torch_bottleneck,
            torch_bn,
            t as tt,
        )
        from tests.test_gru import torch_bigru_maxpool

        cfg = tiny_cfg()
        sd = make_reference_checkpoint()
        converted = convert_textreid_checkpoint(sd, cfg)
        model = tiny_model(cfg)

        rng = np.random.RandomState(3)
        n = 4  # divides MoCo K
        pixels_u8 = rng.randint(0, 255, (n, 32, 16, 3), dtype=np.uint8)
        token_ids = rng.randint(1, 40, (n, 10)).astype(np.int32)
        lengths = np.array([10, 4, 7, 1], np.int64)

        # ---- ours ----------------------------------------------------------
        batch = {
            "pixels": pixels_u8,
            "erase": np.zeros((n, 5), np.int32),
            "token_ids": token_ids,
            "lengths": lengths.astype(np.int32),
            "pids": np.zeros(n, np.int32),
        }
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["pixels"]),
            jnp.asarray(batch["token_ids"]), jnp.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch)
        merged = merge_pretrained(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"params": converted["params"],
             "batch_stats": converted["batch_stats"]},
        )
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        v_ours, t_ours = encode_step(model, state, batch)

        # ---- torch oracle ----------------------------------------------------
        mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
        x = (pixels_u8.astype(np.float32) / 255.0 - mean) / std
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

        vsd = {k[len("visual_model."):]: v for k, v in sd.items()
               if k.startswith("visual_model.")}
        # resize pos-embed exactly the way the converter did
        vsd = dict(vsd)
        vsd["attnpool.positional_embedding"] = np.asarray(
            converted["params"]["visual"]["attnpool"]["positional_embedding"]
        )
        y = TF.relu(torch_bn(TF.conv2d(xt, tt(vsd, "conv1.weight"), stride=2,
                                       padding=1), vsd, "bn1"))
        y = TF.relu(torch_bn(TF.conv2d(y, tt(vsd, "conv2.weight"), padding=1),
                             vsd, "bn2"))
        y = TF.relu(torch_bn(TF.conv2d(y, tt(vsd, "conv3.weight"), padding=1),
                             vsd, "bn3"))
        y = TF.avg_pool2d(y, 2)
        for stage, blocks in enumerate(LAYERS, start=1):
            stride = 1 if stage == 1 else (2 if stage < 4 else 1)
            for b in range(blocks):
                y = torch_bottleneck(y, vsd, f"layer{stage}.{b}",
                                     stride if b == 0 else 1)
        v_feat = torch_attnpool(y, vsd, heads=4, out_dim=OUT_DIM)
        v_want = TF.linear(
            v_feat,
            torch.from_numpy(sd["embed_model.v_embed_layer.weight"]),
            torch.from_numpy(sd["embed_model.v_embed_layer.bias"]),
        ).detach().numpy()

        # text tower: frozen-table lookup (our init fallback table) + GRU
        table = np.asarray(
            variables["constants"]["textual"]["frozen_token_table"]
        )
        embedded = table[token_ids]
        t_feat = torch_bigru_maxpool(
            embedded.astype(np.float32), lengths,
            sd["textual_model.gru.weight_ih_l0"],
            sd["textual_model.gru.weight_hh_l0"],
            sd["textual_model.gru.weight_ih_l0_reverse"],
            sd["textual_model.gru.weight_hh_l0_reverse"],
            HID,
        )
        t_want = TF.linear(
            torch.from_numpy(t_feat),
            torch.from_numpy(sd["embed_model.t_embed_layer.weight"]),
            torch.from_numpy(sd["embed_model.t_embed_layer.bias"]),
        ).detach().numpy()

        np.testing.assert_allclose(np.asarray(v_ours), v_want, atol=3e-4)
        np.testing.assert_allclose(np.asarray(t_ours), t_want, atol=3e-5)
