"""Checkpoint export: our TrainState pieces -> reference-layout torch state
dict (`utils/weight_convert.py:export_textreid_checkpoint`).  The contract
is bit-exact round-tripping through the importer, so a model trained here
is evaluable by the upstream torch code unchanged."""

import numpy as np

from tests.test_full_checkpoint_convert import (
    _dense_sd,
    _gru_sd,
    make_reference_checkpoint,
    tiny_cfg,
)
from tests.test_weight_convert import _rand_m_resnet_sd
from textreid_tpu.utils.weight_convert import (
    convert_textreid_checkpoint,
    export_textreid_checkpoint,
    load_torch_state_dict,
    save_torch_state_dict,
)

RNG = np.random.RandomState(5)


def _simple_head_sd():
    """A reference-layout simple-head state dict (visual_embed_layer /
    textual_embed_layer naming, reference simple_head/head.py)."""
    sd = {}
    for k, v in _rand_m_resnet_sd((3, 4, 6, 3), 8, 24).items():
        sd["visual_model." + k] = v
    sd.update(_gru_sd("textual_model."))
    sd.update(_dense_sd("embed_model.visual_embed_layer", 16, 24))
    sd.update(_dense_sd("embed_model.textual_embed_layer", 16, 12))
    sd["embed_model.loss_evaluator.projection"] = RNG.randn(
        16, 11).astype(np.float32)
    return sd


class TestRoundTrip:
    def test_moco_checkpoint_round_trips_bit_exact(self):
        """reference sd -> import -> export: every original key comes back
        with identical values (queues re-transposed to [D, K], id/ptr back
        to the reference's [1, K]/[1] int64 buffers).  Exception by design:
        the attnpool positional embedding — the importer resizes it from
        the checkpoint grid (7x7 CLIP-224 here) to the training grid, and
        the export keeps the trained-grid table (the reference resizes at
        load time itself, m_resnet.py:220-232)."""
        cfg = tiny_cfg()
        sd = make_reference_checkpoint()
        pieces = convert_textreid_checkpoint(sd, cfg)
        back = export_textreid_checkpoint(pieces, cfg)
        missing = set(sd) - set(back)
        assert not missing, f"keys lost in round trip: {sorted(missing)}"
        pos_keys = {k for k in sd if k.endswith("positional_embedding")}
        for k, v in sd.items():
            if k in pos_keys:
                continue
            np.testing.assert_array_equal(
                back[k], v, err_msg=f"round-trip mismatch at {k}")
            assert back[k].dtype == v.dtype, k
        # pos embeds come back at the TRAINED grid (2x1 -> 3 rows), equal
        # to the imported params
        got = back["visual_model.attnpool.positional_embedding"]
        assert got.shape[0] == 2 * 1 + 1
        np.testing.assert_array_equal(
            got,
            np.asarray(
                pieces["params"]["visual"]["attnpool"]
                ["positional_embedding"]))

    def test_simple_head_round_trips(self):
        """The baseline (simple-head) layout: visual_embed_layer /
        textual_embed_layer naming (reference simple_head/head.py)."""
        cfg = tiny_cfg()
        cfg.MODEL.EMBEDDING.EMBED_HEAD = "simple"
        sd = _simple_head_sd()
        pieces = convert_textreid_checkpoint(sd, cfg)
        back = export_textreid_checkpoint(pieces, cfg)
        missing = set(sd) - set(back)
        assert not missing, f"keys lost in round trip: {sorted(missing)}"
        for k, v in sd.items():
            if k.endswith("positional_embedding"):
                continue  # import-time grid resize; see the MoCo test
            np.testing.assert_array_equal(
                back[k], v, err_msg=f"round-trip mismatch at {k}")

    def test_pth_file_round_trip(self, tmp_path):
        """save_torch_state_dict writes the reference Checkpointer's
        ``{"model": ...}`` envelope; load_torch_state_dict reads it back."""
        cfg = tiny_cfg()
        sd = make_reference_checkpoint()
        pieces = convert_textreid_checkpoint(sd, cfg)
        back = export_textreid_checkpoint(pieces, cfg)
        path = str(tmp_path / "exported.pth")
        save_torch_state_dict(back, path)
        loaded = load_torch_state_dict(path)
        assert set(loaded) == set(back)
        for k in back:
            np.testing.assert_array_equal(loaded[k], back[k])
        # and the loaded file re-imports cleanly
        pieces2 = convert_textreid_checkpoint(loaded, cfg)
        np.testing.assert_array_equal(
            np.asarray(pieces2["params"]["projection"]),
            np.asarray(pieces["params"]["projection"]))

    def test_transformer_tower_refuses_export(self):
        cfg = tiny_cfg()
        cfg.MODEL.TEXTUAL_MODEL = "transformer"
        try:
            export_textreid_checkpoint({"params": {}}, cfg)
        except ValueError as e:
            assert "bigru" in str(e)
        else:
            raise AssertionError("transformer export must raise")

    def test_embedding_pad_row_zeroed(self):
        """nn.Embedding(padding_idx=0): the exported table's row 0 is zero
        even when the live param drifted there (the flax apply masks it at
        call time, gru.py embed_tokens)."""
        cfg = tiny_cfg()
        cfg.MODEL.EMBEDDING.EMBED_HEAD = "simple"
        pieces = convert_textreid_checkpoint(_simple_head_sd(), cfg)
        table = RNG.randn(40, 8).astype(np.float32)
        pieces["params"]["textual"]["token_embedding"] = table
        back = export_textreid_checkpoint(pieces, cfg)
        got = back["textual_model.embed.weight"]
        np.testing.assert_array_equal(got[0], np.zeros(8, np.float32))
        np.testing.assert_array_equal(got[1:], table[1:])


class TestInstallTorchCheckpoint:
    """Regression: build_eval_state's .pth branch must install the MoCo
    pieces (key encoders, queues, pointer) — not just params/batch_stats —
    or re-exporting a torch checkpoint (tools/export_torch.py
    --checkpoint-file *.pth) would silently emit random-init MoCo state."""

    def test_moco_pieces_installed_and_reexport_matches(self):
        import jax

        from tests.test_full_checkpoint_convert import tiny_model
        from textreid_tpu.engine import create_train_state
        from textreid_tpu.solver import make_optimizer
        from textreid_tpu.utils.bootstrap import install_torch_checkpoint

        cfg = tiny_cfg()
        sd = make_reference_checkpoint()
        converted = convert_textreid_checkpoint(sd, cfg)

        model = tiny_model(cfg)
        rng = np.random.RandomState(2)
        batch = {
            "pixels": rng.randint(0, 255, (4, 32, 16, 3), dtype=np.uint8),
            "erase": np.zeros((4, 5), np.int32),
            "token_ids": rng.randint(1, 40, (4, 10)).astype(np.int32),
            "lengths": rng.randint(2, 10, (4,)).astype(np.int32),
            "pids": rng.randint(0, 11, (4,)).astype(np.int32),
        }
        variables = model.init(
            jax.random.PRNGKey(0), np.asarray(batch["pixels"]),
            np.asarray(batch["token_ids"]), np.asarray(batch["lengths"]),
            method="init_all",
        )
        tx = make_optimizer(cfg, variables["params"])
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch)
        state = install_torch_checkpoint(state, converted)

        # the checkpoint's MoCo buffers landed in the state (not random init)
        np.testing.assert_array_equal(
            np.asarray(state.v_queue), sd["embed_model.v_queue"].T)
        np.testing.assert_array_equal(
            np.asarray(state.id_queue),
            sd["embed_model.id_queue"].reshape(-1).astype(np.int32))
        assert int(state.queue_ptr) == int(sd["embed_model.queue_ptr"][0])
        np.testing.assert_allclose(
            np.asarray(state.key_params["visual"]["conv1"]["kernel"]),
            np.asarray(converted["key_params"]["visual"]["conv1"]["kernel"]))

        # and exporting that state reproduces the original key/queue tensors
        pieces = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "key_params": jax.device_get(state.key_params),
            "key_batch_stats": jax.device_get(state.key_batch_stats),
            "v_queue": jax.device_get(state.v_queue),
            "t_queue": jax.device_get(state.t_queue),
            "id_queue": jax.device_get(state.id_queue),
            "queue_ptr": jax.device_get(state.queue_ptr),
        }
        back = export_textreid_checkpoint(pieces, cfg)
        np.testing.assert_allclose(
            back["embed_model.v_queue"], sd["embed_model.v_queue"],
            rtol=1e-6)
        np.testing.assert_allclose(
            back["embed_model.v_encoder_k.conv1.weight"],
            sd["embed_model.v_encoder_k.conv1.weight"], rtol=1e-6)

        # queue buffers get the same shape gate as params: a checkpoint
        # trained with a different MOCO.K must fail with the buffer named
        import pytest

        wrong = dict(converted)
        wrong["v_queue"] = np.zeros(
            (converted["v_queue"].shape[0] * 2,
             converted["v_queue"].shape[1]), np.float32)
        with pytest.raises(ValueError, match="v_queue"):
            install_torch_checkpoint(state, wrong)


class TestMergeShapeValidation:
    """Regression: merge_pretrained must refuse wrong-shaped checkpoint
    leaves with a clear error instead of installing them and crashing
    later inside a jitted step (train_net.py textual warm-start with a
    mismatched CLIP archive)."""

    def test_shape_mismatch_raises_with_path(self):
        import pytest

        from textreid_tpu.utils.weight_convert import merge_pretrained

        variables = {"params": {"textual": {
            "text_projection": np.zeros((4, 4), np.float32)}}}
        wrong = {"params": {"textual": {
            "text_projection": np.ones((4, 8), np.float32)}}}
        with pytest.raises(ValueError, match="params/textual/text_projection"):
            merge_pretrained(variables, wrong)

    def test_matching_shapes_still_merge(self):
        from textreid_tpu.utils.weight_convert import merge_pretrained

        variables = {"params": {"a": np.zeros((3,), np.float32)}}
        src = {"params": {"a": np.ones((3,), np.float64)}}
        out = merge_pretrained(variables, src)
        assert np.asarray(out["params"]["a"]).dtype == np.float32
        np.testing.assert_array_equal(np.asarray(out["params"]["a"]),
                                      np.ones(3, np.float32))
