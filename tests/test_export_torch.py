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
        sd = {}
        for k, v in _rand_m_resnet_sd((3, 4, 6, 3), 8, 24).items():
            sd["visual_model." + k] = v
        sd.update(_gru_sd("textual_model."))
        sd.update(_dense_sd("embed_model.visual_embed_layer", 16, 24))
        sd.update(_dense_sd("embed_model.textual_embed_layer", 16, 12))
        sd["embed_model.loss_evaluator.projection"] = RNG.randn(
            16, 11).astype(np.float32)
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
        sd = {}
        for k, v in _rand_m_resnet_sd((3, 4, 6, 3), 8, 24).items():
            sd["visual_model." + k] = v
        sd.update(_gru_sd("textual_model."))
        sd.update(_dense_sd("embed_model.visual_embed_layer", 16, 24))
        sd.update(_dense_sd("embed_model.textual_embed_layer", 16, 12))
        sd["embed_model.loss_evaluator.projection"] = RNG.randn(
            16, 11).astype(np.float32)
        pieces = convert_textreid_checkpoint(sd, cfg)
        table = RNG.randn(40, 8).astype(np.float32)
        pieces["params"]["textual"]["token_embedding"] = table
        back = export_textreid_checkpoint(pieces, cfg)
        got = back["textual_model.embed.weight"]
        np.testing.assert_array_equal(got[0], np.zeros(8, np.float32))
        np.testing.assert_array_equal(got[1:], table[1:])
