"""ICFG-PEDES ingestion: the release-format converter (tools/convert_icfg.py)
and a cross-dataset train-on-CUHK / eval-on-ICFG run through test_net.py —
the reference README's "Experiments on other datasets" TODO, exercised
end-to-end (BASELINE.json config #4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from textreid_tpu.data.datasets import ICFGPEDESDataset  # noqa: E402
from tools.convert_icfg import build_vocab, convert, load_release  # noqa: E402

CAPTIONS = [
    "a man wearing a red jacket and blue jeans",
    "a woman in a long black coat carrying a bag",
    "a man with a grey hoodie and white sneakers",
    "a woman wearing a striped shirt and a skirt",
]


def make_release(path, num_ids=6, images_per_id=2, layout="flat",
                 with_processed_tokens=True, img_root=None):
    """Write a synthetic file in the published ICFG-PEDES layout (SSAN
    release: CUHK-PEDES reid_raw.json-style records) and optionally the
    images it names."""
    rng = np.random.RandomState(0)
    records = []
    for pid in range(num_ids):
        # release ids are 1-based and non-contiguous (every 3rd id skipped)
        release_id = 1 + pid * 2
        split = "test" if pid >= num_ids - 2 else "train"
        for j in range(images_per_id):
            fp = f"{split}/{release_id:04d}/{release_id:04d}_{j:03d}.png"
            caps = [CAPTIONS[rng.randint(len(CAPTIONS))] for _ in range(2)]
            rec = {
                "id": release_id,
                "file_path": fp,
                "captions": caps,
                "split": split,
            }
            if with_processed_tokens:
                rec["processed_tokens"] = [c.split() for c in caps]
            records.append(rec)
            if img_root is not None:
                full = os.path.join(img_root, fp)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                arr = rng.randint(0, 255, (32, 16, 3), dtype=np.uint8)
                Image.fromarray(arr).save(full)
    if layout == "flat":
        payload = records
    elif layout == "by_split":
        payload = {"train": [r for r in records if r["split"] == "train"],
                   "test": [r for r in records if r["split"] == "test"]}
    else:
        raise AssertionError(layout)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)
    return records


class TestLoadRelease:
    def test_flat_list_with_split_fields(self, tmp_path):
        path = str(tmp_path / "ICFG-PEDES.json")
        make_release(path, layout="flat")
        by_split = load_release(path)
        assert set(by_split) == {"train", "test"}
        assert all(r["split"] == "train" for r in by_split["train"])

    def test_dict_keyed_by_split(self, tmp_path):
        path = str(tmp_path / "ICFG-PEDES.json")
        make_release(path, layout="by_split")
        by_split = load_release(path)
        assert set(by_split) == {"train", "test"}

    def test_unknown_layout_rejected(self, tmp_path):
        path = str(tmp_path / "bad.json")
        (tmp_path / "bad.json").write_text(json.dumps({"a": 1, "b": 2}))
        with pytest.raises(ValueError, match="unrecognized dict layout"):
            load_release(path)


class TestVocab:
    def test_frequency_ordered_ids_from_one(self, tmp_path):
        path = str(tmp_path / "r.json")
        make_release(path)
        by_split = load_release(path)
        vocab = build_vocab(by_split["train"])
        assert 0 not in vocab.values()  # 0 reserved for pad/<unk>
        assert min(vocab.values()) == 1
        counts = {}
        for rec in by_split["train"]:
            for toks in rec["processed_tokens"]:
                for w in toks:
                    counts[w] = counts.get(w, 0) + 1
        ordered = sorted(vocab, key=vocab.get)
        freqs = [counts[w] for w in ordered]
        assert freqs == sorted(freqs, reverse=True)

    def test_min_count_drops_rare_words(self, tmp_path):
        path = str(tmp_path / "r.json")
        make_release(path)
        by_split = load_release(path)
        full = build_vocab(by_split["train"], min_count=1)
        pruned = build_vocab(by_split["train"], min_count=3)
        assert set(pruned) < set(full)


class TestConvert:
    def test_converted_annotations_load_as_dataset(self, tmp_path):
        release = str(tmp_path / "ICFG-PEDES.json")
        out_root = str(tmp_path / "icfgpedes")
        make_release(release, img_root=os.path.join(out_root, "imgs"))
        stats = convert(release, out_root)
        assert stats["train"] == 4 * 2 * 2  # 4 ids x 2 imgs x 2 captions
        assert stats["test"] == 2 * 2 * 2
        for split in ("train", "test"):
            ds = ICFGPEDESDataset(
                root=out_root,
                ann_file=os.path.join(out_root, "annotations",
                                      f"{split}.json"),
            )
            sample = ds[0]
            assert np.asarray(sample["pixels"]).shape[-1] == 3
            assert sample["token_ids"].dtype == np.int32
            assert int(sample["length"]) > 0

    def test_train_pids_contiguous_test_pids_preserved(self, tmp_path):
        release = str(tmp_path / "r.json")
        out_root = str(tmp_path / "out")
        records = make_release(release)
        convert(release, out_root)
        with open(os.path.join(out_root, "annotations", "train.json")) as f:
            train = json.load(f)["annotations"]
        with open(os.path.join(out_root, "annotations", "test.json")) as f:
            test = json.load(f)["annotations"]
        train_pids = sorted({r["id"] for r in train})
        assert train_pids == list(range(len(train_pids)))
        release_test_ids = {r["id"] for r in records if r["split"] == "test"}
        assert {r["id"] for r in test} == release_test_ids

    def test_image_ids_dedupe_by_file_path(self, tmp_path):
        release = str(tmp_path / "r.json")
        out_root = str(tmp_path / "out")
        make_release(release)
        convert(release, out_root)
        with open(os.path.join(out_root, "annotations", "train.json")) as f:
            train = json.load(f)["annotations"]
        by_fp = {}
        for r in train:
            by_fp.setdefault(r["file_path"], set()).add(r["image_id"])
        assert all(len(v) == 1 for v in by_fp.values())
        assert len({next(iter(v)) for v in by_fp.values()}) == len(by_fp)

    def test_onehot_ids_within_vocab_and_sentence_kept(self, tmp_path):
        release = str(tmp_path / "r.json")
        out_root = str(tmp_path / "out")
        make_release(release, with_processed_tokens=False)  # tokenize path
        stats = convert(release, out_root, max_length=6)
        with open(os.path.join(out_root, "annotations", "train.json")) as f:
            train = json.load(f)["annotations"]
        for r in train:
            assert len(r["onehot"]) <= 6
            assert all(0 <= t < stats["vocab_size"] for t in r["onehot"])
            assert r["sentence"]

    def test_cli_entrypoint(self, tmp_path):
        release = str(tmp_path / "r.json")
        out_root = str(tmp_path / "out")
        make_release(release)
        result = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "convert_icfg.py"),
             release, out_root, "--max-length", "100"],
            capture_output=True, text=True, timeout=120,
        )
        assert result.returncode == 0, result.stderr
        stats = json.loads(result.stdout.strip().splitlines()[-1])
        assert stats["train"] > 0 and stats["vocab_size"] > 1
        assert os.path.exists(
            os.path.join(out_root, "annotations", "vocab.json"))


@pytest.mark.slow
class TestCrossDataset:
    """Train on (synthetic) CUHK-PEDES, evaluate on converted (synthetic)
    ICFG-PEDES through the real CLIs — BASELINE.json config #4's
    cross-dataset surface."""

    def test_train_cuhk_eval_icfg(self, tmp_path):
        from textreid_tpu.data import make_synthetic_dataset

        root = tmp_path
        cuhk = root / "datasets" / "cuhkpedes"
        make_synthetic_dataset(str(cuhk), num_identities=8, images_per_id=2,
                               image_size=(32, 16), max_tokens=10,
                               split="train")
        make_synthetic_dataset(str(cuhk), num_identities=4, images_per_id=2,
                               image_size=(32, 16), max_tokens=10,
                               split="test", seed=1)
        # real-format ICFG release -> converter -> catalog location
        icfg_root = root / "datasets" / "icfgpedes"
        release = root / "ICFG-PEDES.json"
        make_release(str(release), num_ids=6,
                     img_root=str(icfg_root / "imgs"))
        convert(str(release), str(icfg_root))

        cfg_dir = root / "configs" / "tiny"
        cfg_dir.mkdir(parents=True)
        (cfg_dir / "cross.yaml").write_text("""
MODEL:
  VISUAL_MODEL: "resnet18"
  TEXTUAL_MODEL: "bigru"
  NUM_CLASSES: 8
  GRU:
    ONEHOT: "yes"
    EMBEDDING_SIZE: 16
    NUM_UNITS: 16
    VOCABULARY_SIZE: 100
  EMBEDDING:
    EMBED_HEAD: 'moco'
    FEATURE_SIZE: 16
    EPSILON: 0.1
  MOCO:
    FC: False
    K: 16
INPUT:
  HEIGHT: 32
  WIDTH: 16
  MAX_TEXT_LENGTH: 10
DATASETS:
  TRAIN: ("cuhkpedes_train", )
  TEST: ("cuhkpedes_test", )
DATALOADER:
  IMS_PER_ID: 2
  NUM_WORKERS: 2
SOLVER:
  IMS_PER_BATCH: 8
  NUM_EPOCHS: 1
  BASE_LR: 0.0001
  CHECKPOINT_PERIOD: 1
  EVALUATE_PERIOD: 1
  WARMUP_EPOCHS: 0
TEST:
  IMS_PER_BATCH: 8
""")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["TEXTREID_FORCE_CPU"] = "1"

        def run(script, args):
            result = subprocess.run(
                [sys.executable, os.path.join(REPO, script), *args],
                cwd=str(root), env=env, capture_output=True, text=True,
                timeout=1800,
            )
            assert result.returncode == 0, (
                f"{script} failed\nSTDOUT:\n{result.stdout[-4000:]}\n"
                f"STDERR:\n{result.stderr[-4000:]}")
            return result.stdout + result.stderr

        run("train_net.py",
            ["--root", str(root), "--config-file", "configs/tiny/cross.yaml"])
        out_dir = root / "output" / "tiny" / "cross"
        assert (out_dir / "best").is_dir()
        # cross-dataset eval: same checkpoint, ICFG test set
        combined = run("test_net.py", [
            "--root", str(root), "--config-file", "configs/tiny/cross.yaml",
            "--checkpoint-file", str(out_dir / "best"),
            "DATASETS.TEST", '("icfgpedes_test",)',
        ])
        assert "t2i" in combined and "mAP" in combined
