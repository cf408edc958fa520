"""Data pipeline tests: PK sampler invariants, transform semantics vs
torchvision, dataset/loader shapes, eval padding (SURVEY.md section 4.1/4.3)."""

import numpy as np
import pytest
from PIL import Image

from textreid_tpu.config import get_default_cfg
from textreid_tpu.data import (
    TripletSampler,
    build_transforms,
    make_data_loader,
    make_synthetic_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    ds_dir = root / "datasets" / "cuhkpedes"
    make_synthetic_dataset(str(ds_dir), num_identities=8, images_per_id=4,
                           split="train")
    make_synthetic_dataset(str(ds_dir), num_identities=4, images_per_id=2,
                           split="test", seed=1)
    return str(root)


def _cfg(root):
    cfg = get_default_cfg()
    cfg.ROOT = root
    cfg.DATASETS.TRAIN = ("cuhkpedes_train",)
    cfg.DATASETS.TEST = ("cuhkpedes_test",)
    cfg.INPUT.HEIGHT = 32
    cfg.INPUT.WIDTH = 16
    cfg.INPUT.USE_AUG = True
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.TEST.IMS_PER_BATCH = 3
    cfg.DATALOADER.IMS_PER_ID = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    return cfg


class TestTripletSampler:
    def test_pk_invariants(self):
        rng = np.random.RandomState(0)
        # 10 identities, variable counts incl. one under-K identity
        pids = []
        for pid in range(10):
            pids += [pid] * int(rng.randint(1, 9))
        sampler = TripletSampler(pids, batch_size=8, images_per_pid=4)
        pid_arr = np.array(pids)
        for batch in sampler:
            assert len(batch) == 8
            batch_pids = pid_arr[batch]
            unique, counts = np.unique(batch_pids, return_counts=True)
            assert len(unique) == 2  # P = 8/4
            assert (counts == 4).all()  # K instances each

    def test_short_identity_padded_by_repetition(self):
        pids = [0, 0, 1]  # pid 1 has 1 sample < K=2
        sampler = TripletSampler(pids, batch_size=4, images_per_pid=2)
        batches = list(sampler)
        assert batches, "one full batch expected"
        flat = np.concatenate(batches)
        assert 2 in flat  # pid 1's only index appears (repeated)

    def test_epochs_differ(self):
        pids = sum([[p] * 4 for p in range(8)], [])
        sampler = TripletSampler(pids, batch_size=8, images_per_pid=4, seed=3)
        a = list(sampler)
        b = list(sampler)
        assert a != b

    def test_len_matches_iteration(self):
        pids = sum([[p] * 4 for p in range(6)], [])
        sampler = TripletSampler(pids, batch_size=8, images_per_pid=4)
        assert len(sampler) == len(list(sampler))


class TestTransforms:
    def _cfg(self):
        cfg = get_default_cfg()
        cfg.INPUT.HEIGHT = 24
        cfg.INPUT.WIDTH = 12
        cfg.INPUT.USE_AUG = True
        return cfg

    def test_eval_matches_resize_normalize_oracle(self):
        # torchvision eval chain = PIL bilinear resize -> /255 -> normalize;
        # (torchvision itself is not in this image) reproduce it inline.
        cfg = self._cfg()
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (48, 24, 3), np.uint8)
        )
        ours, _ = build_transforms(cfg, is_train=False)(img)
        resized = np.asarray(
            img.resize((12, 24), Image.BILINEAR), dtype=np.float32
        ) / 255.0
        want = (resized - np.array(cfg.INPUT.PIXEL_MEAN, np.float32)) / np.array(
            cfg.INPUT.PIXEL_STD, np.float32
        )
        np.testing.assert_allclose(ours, want, atol=1e-6)

    def test_train_output_shape_and_range(self):
        cfg = self._cfg()
        tf = build_transforms(cfg, is_train=True,
                              rng=np.random.RandomState(0))
        img = Image.fromarray(np.full((48, 24, 3), 128, np.uint8))
        out, erase = tf(img)
        assert out.shape == (24, 12, 3)
        assert out.dtype == np.float32
        assert erase.shape == (5,)

    def test_erasing_fills_with_pixel_mean(self):
        cfg = self._cfg()
        tf = build_transforms(cfg, is_train=True,
                              rng=np.random.RandomState(1))
        tf.erase_prob = 1.0
        img = Image.fromarray(np.zeros((48, 24, 3), np.uint8))
        out, erase = tf(img)
        assert erase[0] == 1
        mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        # some pixels must equal the raw (un-normalized) pixel mean fill
        hits = np.isclose(out, mean, atol=1e-6).all(axis=-1)
        assert hits.any()


class TestLoader:
    def test_train_loader_batches(self, synth_root):
        cfg = _cfg(synth_root)
        loader = make_data_loader(cfg, is_train=True)
        batch = next(iter(loader))
        assert batch["pixels"].shape == (8, 32, 16, 3)
        assert batch["pixels"].dtype == np.uint8  # device-prep pipeline
        assert batch["erase"].shape == (8, 5)
        assert batch["token_ids"].shape == (8, 105)
        assert batch["lengths"].min() >= 1
        assert batch["valid"].all()
        # PK structure: 4 pids x 2 instances
        unique, counts = np.unique(batch["pids"], return_counts=True)
        assert len(unique) == 4 and (counts == 2).all()

    def test_eval_loader_pads_final_batch(self, synth_root):
        cfg = _cfg(synth_root)
        loaders = make_data_loader(cfg, is_train=False)
        assert len(loaders) == 1
        batches = list(loaders[0])
        # 8 samples with batch 3 -> 3 batches, last padded
        assert len(batches) == 3
        assert all(b["pixels"].shape[0] == 3 for b in batches)
        assert batches[-1]["valid"].sum() == 2
        total_valid = sum(int(b["valid"].sum()) for b in batches)
        assert total_valid == 8
        # indices cover the dataset exactly once (under the valid mask)
        got = np.concatenate([b["index"][b["valid"]] for b in batches])
        np.testing.assert_array_equal(np.sort(got), np.arange(8))

    def test_token_truncation(self, synth_root):
        cfg = _cfg(synth_root)
        cfg.INPUT.MAX_TEXT_LENGTH = 5
        loader = make_data_loader(cfg, is_train=True)
        batch = next(iter(loader))
        assert batch["token_ids"].shape[1] == 5
        assert batch["lengths"].max() <= 5


class TestDevicePrepEquivalence:
    def test_device_preprocess_matches_host_pipeline(self, synth_root):
        """uint8 + on-device normalize/erase == the all-host f32 chain."""
        import jax.numpy as jnp

        from textreid_tpu.models import BiGRUEncoder, TextReIDModel
        from textreid_tpu.models.m_resnet import ModifiedResNet

        cfg = _cfg(synth_root)
        model = TextReIDModel(
            visual=ModifiedResNet(
                layers=(1, 1, 1, 1), output_dim=8, heads=4, last_stride=1,
                input_resolution=(32, 16), width=16,
            ),
            textual=BiGRUEncoder(hidden_dim=8, vocab_size=100, embed_size=8),
            feature_size=8, num_classes=8,
            pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
            pixel_std=tuple(cfg.INPUT.PIXEL_STD),
        )

        # identical host RNG seeds -> identical geometry + erase rects
        cfg_host = _cfg(synth_root); cfg_host.TPU.DEVICE_PREP = False
        cfg_dev = _cfg(synth_root); cfg_dev.TPU.DEVICE_PREP = True
        host_batch = next(iter(make_data_loader(cfg_host, is_train=True)))
        dev_batch = next(iter(make_data_loader(cfg_dev, is_train=True)))
        np.testing.assert_array_equal(host_batch["index"], dev_batch["index"])
        np.testing.assert_array_equal(host_batch["erase"], dev_batch["erase"])
        assert dev_batch["pixels"].dtype == np.uint8
        assert host_batch["pixels"].dtype == np.float32

        from textreid_tpu.models.model import preprocess_pixels

        prepped = preprocess_pixels(
            jnp.asarray(dev_batch["pixels"]), jnp.asarray(dev_batch["erase"]),
            tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD),
        )
        np.testing.assert_allclose(
            np.asarray(prepped), host_batch["pixels"], atol=1e-5
        )


class TestLoaderDeterminism:
    def test_batches_identical_across_worker_counts(self, synth_root):
        """Augmentation is derived from (seed, epoch, position) — thread
        scheduling and worker count must not change the stream."""
        batches = []
        for workers in (1, 4):
            cfg = _cfg(synth_root)
            cfg.DATALOADER.NUM_WORKERS = workers
            loader = make_data_loader(cfg, is_train=True)
            batches.append(list(loader))
        assert len(batches[0]) == len(batches[1])
        for a, b in zip(*batches):
            for key in a:
                np.testing.assert_array_equal(a[key], b[key], err_msg=key)

    def test_epoch_replay_is_identical(self, synth_root):
        cfg = _cfg(synth_root)
        l1 = make_data_loader(cfg, is_train=True)
        l2 = make_data_loader(cfg, is_train=True)
        for a, b in zip(l1, l2):
            np.testing.assert_array_equal(a["pixels"], b["pixels"])
            np.testing.assert_array_equal(a["erase"], b["erase"])


class TestCrossDataset:
    def test_concat_training_and_icfg_eval(self, synth_root, tmp_path_factory):
        """BASELINE config 'ICFG-PEDES dataloader + cross-dataset
        train/eval': concatenated CUHK+ICFG training set (ConcatDataset
        path) and ICFG eval loader."""
        root = tmp_path_factory.mktemp("cross")
        for name, ids in (("cuhkpedes", 6), ("icfgpedes", 4)):
            ds = root / "datasets" / name
            make_synthetic_dataset(str(ds), num_identities=ids,
                                   images_per_id=2, split="train",
                                   seed=ids)
            make_synthetic_dataset(str(ds), num_identities=2,
                                   images_per_id=2, split="test",
                                   seed=ids + 1)

        cfg = _cfg(str(root))
        cfg.DATASETS.TRAIN = ("cuhkpedes_train", "icfgpedes_train")
        cfg.DATASETS.TEST = ("icfgpedes_test",)
        cfg.DATALOADER.IMS_PER_ID = 2
        cfg.SOLVER.IMS_PER_BATCH = 4

        loader = make_data_loader(cfg, is_train=True)
        n_cuhk, n_icfg = 12, 8
        assert len(loader.dataset) == n_cuhk + n_icfg
        # indices from both halves appear over an epoch
        seen = np.concatenate([b["index"] for b in loader])
        assert (seen < n_cuhk).any() and (seen >= n_cuhk).any()
        # get_id_info passthrough across the concat boundary
        image_id, pid = loader.dataset.get_id_info(n_cuhk)  # first ICFG row
        assert pid == 0 and image_id == 0

        eval_loaders = make_data_loader(cfg, is_train=False)
        assert len(eval_loaders) == 1
        batch = next(iter(eval_loaders[0]))
        assert batch["pixels"].shape[0] == cfg.TEST.IMS_PER_BATCH


class TestSchemaValidation:
    """Wrong-schema annotation JSON must fail at construction with a message
    naming the file — not as a KeyError deep in a loader worker thread
    (VERDICT r2 next-item 6; reference schema: cuhkpedes.py:37-54)."""

    def _write(self, tmp_path, payload):
        import json

        ann = tmp_path / "bad.json"
        ann.write_text(json.dumps(payload))
        return str(ann)

    def test_missing_annotations_key(self, tmp_path):
        from textreid_tpu.data.datasets import CUHKPEDESDataset

        ann = self._write(tmp_path, {"images": []})
        with pytest.raises(ValueError, match="annotations.*bad.json|bad.json"):
            CUHKPEDESDataset(str(tmp_path), ann)

    def test_missing_record_keys(self, tmp_path):
        from textreid_tpu.data.datasets import CUHKPEDESDataset

        # an ICFG-style raw record: different field names
        ann = self._write(tmp_path, {"annotations": [
            {"img_path": "a.jpg", "captions": ["some text"], "split": "train"}
        ]})
        with pytest.raises(ValueError) as exc:
            CUHKPEDESDataset(str(tmp_path), ann)
        msg = str(exc.value)
        assert "bad.json" in msg
        assert "file_path" in msg and "onehot" in msg

    def test_sentence_mode_requires_sentence(self, tmp_path):
        from textreid_tpu.data.datasets import ICFGPEDESDataset

        ann = self._write(tmp_path, {"annotations": [
            {"file_path": "a.jpg", "onehot": [1], "id": 0, "image_id": 0}
        ]})
        with pytest.raises(ValueError, match="sentence"):
            ICFGPEDESDataset(str(tmp_path), ann, use_onehot=False)

    def test_empty_annotations(self, tmp_path):
        from textreid_tpu.data.datasets import CUHKPEDESDataset

        ann = self._write(tmp_path, {"annotations": []})
        with pytest.raises(ValueError, match="empty"):
            CUHKPEDESDataset(str(tmp_path), ann)

    def test_valid_schema_accepted(self, synth_root):
        import os

        from textreid_tpu.data.datasets import CUHKPEDESDataset

        root = os.path.join(synth_root, "datasets", "cuhkpedes")
        ds = CUHKPEDESDataset(
            root, os.path.join(root, "annotations", "train.json"))
        assert len(ds) > 0


class TestImageCache:
    def test_cache_serves_identical_samples(self, synth_root):
        cfg = _cfg(synth_root)
        cfg.DATALOADER.CACHE_IMAGES = True
        cached = make_data_loader(cfg, is_train=True)
        cfg2 = _cfg(synth_root)
        plain = make_data_loader(cfg2, is_train=True)
        for a, b in zip(cached, plain):
            np.testing.assert_array_equal(a["pixels"], b["pixels"])
        # second epoch hits the cache
        ds = cached.dataset
        assert ds._img_cache is not None and len(ds._img_cache) > 0
        for a in cached:
            pass


class TestFrozenVocabGuard:
    """A missing frozen-table .npy must fail loudly, not silently train on a
    random table (round-1 verdict item: a mistyped --root produced garbage)."""

    def test_missing_table_raises(self, tmp_path):
        from textreid_tpu.utils.vocab import frozen_table_initializer

        cfg = get_default_cfg()
        cfg.MODEL.GRU.ONEHOT = "clip_vit"
        cfg.ROOT = str(tmp_path)  # no datasets/cuhkpedes/clip_vocab_vit.npy
        with pytest.raises(FileNotFoundError, match="clip_vocab_vit"):
            frozen_table_initializer(cfg)

    def test_explicit_optout_allows_random_table(self, tmp_path):
        from textreid_tpu.utils.vocab import frozen_table_initializer

        cfg = get_default_cfg()
        cfg.MODEL.GRU.ONEHOT = "clip_vit"
        cfg.ROOT = str(tmp_path)
        cfg.TPU.ALLOW_RANDOM_VOCAB = True
        assert frozen_table_initializer(cfg) is None

    def test_present_table_loads(self, tmp_path):
        from textreid_tpu.utils.vocab import frozen_table_initializer

        table = np.random.RandomState(0).rand(16, 8).astype(np.float32)
        d = tmp_path / "datasets" / "cuhkpedes"
        d.mkdir(parents=True)
        np.save(d / "clip_vocab_vit.npy", table)
        cfg = get_default_cfg()
        cfg.MODEL.GRU.ONEHOT = "clip_vit"
        cfg.ROOT = str(tmp_path)
        init = frozen_table_initializer(cfg)
        np.testing.assert_array_equal(init(), table)

    def test_model_without_table_raises(self):
        from textreid_tpu.models.gru import BiGRUEncoder
        import jax
        import jax.numpy as jnp

        enc = BiGRUEncoder(hidden_dim=8, vocab_size=16, embed_size=8,
                           use_onehot="clip_vit")
        tokens = jnp.ones((2, 5), jnp.int32)
        lengths = jnp.full((2,), 5, jnp.int32)
        with pytest.raises(ValueError, match="frozen token table"):
            enc.init(jax.random.PRNGKey(0), tokens, lengths)


class TestProcessShardLoader:
    """Per-host shard loading: the ranks' slices must concatenate to exactly
    the unsharded loader's batches (same indices, same augmentation draws)."""

    def _loader(self, synth_root, shard):
        from textreid_tpu.data.loader import make_data_loader

        cfg = get_default_cfg()
        cfg.ROOT = str(synth_root)
        cfg.DATASETS.TRAIN = ("cuhkpedes_train",)
        cfg.SOLVER.IMS_PER_BATCH = 8
        cfg.DATALOADER.IMS_PER_ID = 2
        cfg.DATALOADER.NUM_WORKERS = 2
        cfg.INPUT.HEIGHT, cfg.INPUT.WIDTH = 32, 16
        cfg.INPUT.USE_AUG = True
        cfg.INPUT.MAX_TEXT_LENGTH = 10
        return make_data_loader(cfg, is_train=True, process_shard=shard)

    def test_shards_concatenate_to_global_batches(self, synth_root):
        full = list(iter(self._loader(synth_root, None)))
        r0 = list(iter(self._loader(synth_root, (0, 2))))
        r1 = list(iter(self._loader(synth_root, (1, 2))))
        assert len(full) == len(r0) == len(r1)
        for fb, a, b in zip(full, r0, r1):
            for k in ("pixels", "token_ids", "lengths", "pids", "index",
                      "erase"):
                merged = np.concatenate([a[k], b[k]])
                np.testing.assert_array_equal(merged, fb[k], err_msg=k)
            assert a["pixels"].shape[0] == fb["pixels"].shape[0] // 2

    def test_indivisible_batch_raises(self, synth_root):
        loader = self._loader(synth_root, (0, 3))  # 8 % 3 != 0
        with pytest.raises(ValueError, match="not divisible"):
            next(iter(loader))
