"""Config system tests: yacs-compatible merge/freeze/override semantics and
verbatim loading of the reference experiment YAML schema."""

import os

import pytest
import yaml

from textreid_tpu.config import DatasetCatalog, get_default_cfg

REFERENCE_CONFIG_DIR = "/root/reference/configs/cuhkpedes"


class TestConfigNode:
    def test_defaults_shape(self):
        cfg = get_default_cfg()
        assert cfg.MODEL.GRU.NUM_UNITS == 512
        assert cfg.SOLVER.STEPS == (500,)
        assert cfg.DATASETS.TRAIN == ()

    def test_merge_from_list_with_literal_strings(self):
        cfg = get_default_cfg()
        cfg.merge_from_list(
            ["SOLVER.BASE_LR", "0.01", "MODEL.MOCO.K", "4096",
             "DATASETS.TRAIN", "('cuhkpedes_train',)"]
        )
        assert cfg.SOLVER.BASE_LR == 0.01
        assert cfg.MODEL.MOCO.K == 4096
        assert cfg.DATASETS.TRAIN == ("cuhkpedes_train",)

    def test_unknown_key_rejected(self):
        cfg = get_default_cfg()
        with pytest.raises(KeyError):
            cfg.merge_from_list(["SOLVER.NO_SUCH_KEY", "1"])

    def test_freeze_blocks_mutation(self):
        cfg = get_default_cfg()
        cfg.freeze()
        with pytest.raises(AttributeError):
            cfg.SOLVER.BASE_LR = 1.0
        with pytest.raises(AttributeError):
            cfg.MODEL.GRU.NUM_UNITS = 1
        cfg.defrost()
        cfg.SOLVER.BASE_LR = 1.0
        assert cfg.SOLVER.BASE_LR == 1.0

    def test_clone_is_deep(self):
        cfg = get_default_cfg()
        c2 = cfg.clone()
        c2.MODEL.GRU.NUM_UNITS = 7
        assert cfg.MODEL.GRU.NUM_UNITS == 512

    def test_type_coercion_int_to_float(self):
        cfg = get_default_cfg()
        cfg.merge_from_list(["SOLVER.BASE_LR", "1"])
        assert cfg.SOLVER.BASE_LR == 1.0
        assert isinstance(cfg.SOLVER.BASE_LR, float)

    def test_merge_from_yaml_file(self, tmp_path):
        f = tmp_path / "exp.yaml"
        f.write_text(
            yaml.safe_dump(
                {
                    "MODEL": {"VISUAL_MODEL": "m_resnet50",
                              "EMBEDDING": {"EMBED_HEAD": "moco"}},
                    "SOLVER": {"STEPS": "(40, 70)"},
                }
            )
        )
        cfg = get_default_cfg()
        cfg.merge_from_file(str(f))
        assert cfg.MODEL.VISUAL_MODEL == "m_resnet50"
        assert cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco"
        assert cfg.SOLVER.STEPS == (40, 70)
        # untouched keys survive
        assert cfg.MODEL.GRU.NUM_UNITS == 512


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CONFIG_DIR),
    reason="reference configs not mounted",
)
class TestReferenceYamlCompat:
    """The five shipped reference experiment YAMLs must merge verbatim."""

    @pytest.mark.parametrize(
        "name",
        [
            "baseline_gru_cliprn101_ls_bs128.yaml",
            "baseline_gru_cliprn50_ls_bs128.yaml",
            "baseline_gru_rn50_ls_bs128.yaml",
            "moco_gru_cliprn101_ls_bs128_2048.yaml",
            "moco_gru_cliprn50_ls_bs128_2048.yaml",
        ],
    )
    def test_loads(self, name):
        cfg = get_default_cfg()
        cfg.merge_from_file(os.path.join(REFERENCE_CONFIG_DIR, name))
        cfg.freeze()
        assert cfg.SOLVER.IMS_PER_BATCH == 128
        assert cfg.DATASETS.TRAIN == ("cuhkpedes_train",)
        assert cfg.INPUT.HEIGHT == 384 and cfg.INPUT.WIDTH == 128
        if name.startswith("moco"):
            assert cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco"
            assert cfg.MODEL.MOCO.K == 2048 and cfg.MODEL.MOCO.FC is False


class TestCatalog:
    def test_cuhkpedes_entries(self):
        spec = DatasetCatalog.get("/data", "cuhkpedes_train")
        assert spec["factory"] == "CUHKPEDESDataset"
        assert spec["args"]["ann_file"].endswith(
            "datasets/cuhkpedes/annotations/train.json"
        )

    def test_icfg_extension(self):
        spec = DatasetCatalog.get("/data", "icfgpedes_test")
        assert spec["factory"] == "ICFGPEDESDataset"

    def test_unknown_raises(self):
        with pytest.raises(RuntimeError):
            DatasetCatalog.get("/data", "market1501")


class TestFlagshipCfg:
    """config/flagship.py — the single constructor bench.py,
    tools/profile_step.py and __graft_entry__ all build from."""

    def test_flagship_matches_reference_yaml_shapes(self):
        from textreid_tpu.config import flagship_cfg

        cfg = flagship_cfg()
        # the flagship experiment's identity knobs
        # (configs/cuhkpedes/moco_gru_cliprn50_ls_bs128_2048.yaml)
        assert cfg.MODEL.VISUAL_MODEL == "m_resnet50"
        assert cfg.MODEL.TEXTUAL_MODEL == "bigru"
        assert cfg.MODEL.EMBEDDING.EMBED_HEAD == "moco"
        assert cfg.MODEL.MOCO.K == 2048
        assert cfg.MODEL.EMBEDDING.EPSILON == 0.1
        assert (cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH) == (384, 128)
        assert cfg.TPU.ALLOW_RANDOM_VOCAB  # synthetic-harness contract

    def test_variants(self):
        from textreid_tpu.config import flagship_cfg

        vit = flagship_cfg("vit")
        assert vit.MODEL.VISUAL_MODEL == "clip_vit_b16"
        assert vit.MODEL.TEXTUAL_MODEL == "bigru"
        fc = flagship_cfg("fullclip", fused_attention=True, attn_mode="on",
                          tokens=90)
        assert fc.MODEL.TEXTUAL_MODEL == "transformer"
        assert fc.MODEL.TRANSFORMER.CONTEXT_LENGTH == 90
        assert fc.TPU.FUSED_ATTENTION
        assert fc.TPU.FUSED_ATTENTION_MODE == "on"
        assert fc.TPU.FUSED_ATTENTION_TEXT_MODE == "on"

    def test_rejections(self):
        from textreid_tpu.config import flagship_cfg

        with pytest.raises(ValueError):
            flagship_cfg("resnet9000")
        # fused attention on the GRU flagship would be a silent no-op
        with pytest.raises(ValueError):
            flagship_cfg(fused_attention=True)

    def test_batch_shapes(self):
        from textreid_tpu.config import flagship_batch

        b = flagship_batch(4, tokens=17)
        assert b["pixels"].shape == (4, 384, 128, 3)
        assert b["pixels"].dtype.name == "uint8"
        assert b["token_ids"].shape == (4, 17)
        assert b["lengths"].shape == (4,)
        assert (b["lengths"] < 17).all() and (b["lengths"] >= 10).all()
