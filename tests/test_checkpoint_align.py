"""Tolerant checkpoint alignment (reference lib/utils/checkpoint.py:90-148):
renamed-module and partial checkpoints must load by longest-suffix key
matching instead of silently keeping init or failing."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textreid_tpu.utils.checkpoint import Checkpointer, align_pytree
from textreid_tpu.utils.weight_convert import merge_pretrained


def tree_of(**kw):
    return {k: np.asarray(v, np.float32) for k, v in kw.items()}


class TestAlignPytree:
    def test_exact_match_passthrough(self):
        target = {"visual": {"conv1": {"kernel": np.zeros((2, 2), np.float32)}}}
        loaded = {"visual": {"conv1": {"kernel": np.ones((2, 2), np.float32)}}}
        out = align_pytree(target, loaded)
        np.testing.assert_array_equal(out["visual"]["conv1"]["kernel"], 1.0)

    def test_renamed_parent_module_aligns_by_suffix(self):
        # e.g. an older revision that called the tower "backbone"
        target = {"visual": {"conv1": {"kernel": np.zeros((2, 2), np.float32)}},
                  "projection": np.zeros((3,), np.float32)}
        loaded = {"backbone": {"conv1": {"kernel": np.full((2, 2), 7.0, np.float32)}},
                  "projection": np.full((3,), 2.0, np.float32)}
        out = align_pytree(target, loaded)
        np.testing.assert_array_equal(out["visual"]["conv1"]["kernel"], 7.0)
        np.testing.assert_array_equal(out["projection"], 2.0)

    def test_partial_checkpoint_keeps_init_with_warning(self, caplog):
        target = {"a": {"w": np.zeros((2,), np.float32)},
                  "b": {"w2": np.full((2,), 5.0, np.float32)}}
        loaded = {"a": {"w": np.ones((2,), np.float32)}}
        with caplog.at_level(logging.WARNING, "PersonSearch.checkpoint"):
            out = align_pytree(target, loaded)
        np.testing.assert_array_equal(out["a"]["w"], 1.0)
        np.testing.assert_array_equal(out["b"]["w2"], 5.0)  # kept init
        assert any("kept initialization" in r.message for r in caplog.records)

    def test_shape_mismatch_keeps_init(self, caplog):
        target = {"w": np.zeros((2,), np.float32)}
        loaded = {"w": np.ones((3,), np.float32)}
        with caplog.at_level(logging.WARNING, "PersonSearch.checkpoint"):
            out = align_pytree(target, loaded)
        np.testing.assert_array_equal(out["w"], 0.0)
        assert any("shapes differ" in r.message for r in caplog.records)

    def test_deeper_loaded_path_matches_shallow_target(self):
        # DDP-style extra wrapper on the *loaded* side ("module." analogue)
        target = {"conv1": {"kernel": np.zeros((2, 2), np.float32)}}
        loaded = {"module": {"conv1": {"kernel": np.ones((2, 2), np.float32)}}}
        out = align_pytree(target, loaded)
        np.testing.assert_array_equal(out["conv1"]["kernel"], 1.0)

    def test_longest_suffix_wins(self):
        target = {"v": {"embed": {"kernel": np.zeros((2,), np.float32)}},
                  "t": {"embed": {"kernel": np.zeros((2,), np.float32)}}}
        loaded = {"v": {"embed": {"kernel": np.full((2,), 1.0, np.float32)}},
                  "t": {"embed": {"kernel": np.full((2,), 2.0, np.float32)}}}
        out = align_pytree(target, loaded)
        np.testing.assert_array_equal(out["v"]["embed"]["kernel"], 1.0)
        np.testing.assert_array_equal(out["t"]["embed"]["kernel"], 2.0)


class TestMergePretrainedTolerant:
    def test_tolerant_merge_aligns_renamed_tree(self):
        variables = {"params": {"visual": {"conv1": {"kernel": jnp.zeros((2, 2))}}}}
        converted = {"params": {"trunk": {"conv1": {"kernel": np.ones((2, 2), np.float32)}}}}
        out = merge_pretrained(variables, converted, tolerant=True)
        np.testing.assert_array_equal(
            np.asarray(out["params"]["visual"]["conv1"]["kernel"]), 1.0)

    def test_strict_merge_misses_renamed_tree(self):
        variables = {"params": {"visual": {"conv1": {"kernel": jnp.zeros((2, 2))}}}}
        converted = {"params": {"trunk": {"conv1": {"kernel": np.ones((2, 2), np.float32)}}}}
        out = merge_pretrained(variables, converted, tolerant=False)
        np.testing.assert_array_equal(
            np.asarray(out["params"]["visual"]["conv1"]["kernel"]), 0.0)


class _FakeState:
    """Minimal state stand-in with the Checkpointer's weight fields."""

    def __init__(self, params, batch_stats=None):
        self.params = params
        self.batch_stats = batch_stats
        self.constants = None
        self.key_params = None
        self.key_batch_stats = None

    def replace(self, **kw):
        import copy

        new = copy.copy(self)
        for k, v in kw.items():
            setattr(new, k, v)
        return new


class TestAsyncCheckpointer:
    def test_async_save_then_load_roundtrip(self, tmp_path):
        """async_save=True must overlap writes but synchronize on read —
        a load right after save sees the committed tree."""
        state = _FakeState({"w": np.full((4, 4), 3.5, np.float32)})
        ck = Checkpointer(save_dir=str(tmp_path), async_save=True)
        ck.save("best", {"params": state.params, "batch_stats": None,
                         "constants": None, "key_params": None,
                         "key_batch_stats": None, "step": 7}, epoch=3)
        # immediate second save must serialize, not corrupt
        ck.save("epoch_1", {"params": state.params, "batch_stats": None,
                            "constants": None, "key_params": None,
                            "key_batch_stats": None, "step": 8}, epoch=4)
        assert ck.has_checkpoint("best") and ck.has_checkpoint("epoch_1")
        target = _FakeState({"w": np.zeros((4, 4), np.float32)})
        loaded = ck.load(str(tmp_path / "best"), target)
        np.testing.assert_array_equal(np.asarray(loaded.params["w"]), 3.5)
        import json

        meta = json.loads((tmp_path / "best.meta.json").read_text())
        assert meta["epoch"] == 3
        ck.wait()


class TestCheckpointerTolerantLoad:
    def test_load_renamed_checkpoint_aligns(self, tmp_path):
        import orbax.checkpoint as ocp

        old = _FakeState({"backbone": {"conv1": {"kernel": np.full((2, 2), 3.0, np.float32)}}})
        path = str(tmp_path / "old_ck")
        ocp.PyTreeCheckpointer().save(
            path, {"params": old.params, "batch_stats": None,
                   "constants": None, "key_params": None,
                   "key_batch_stats": None, "step": 0})

        new = _FakeState({"visual": {"conv1": {"kernel": jnp.zeros((2, 2))}}})
        ck = Checkpointer(save_dir=str(tmp_path))
        loaded = ck.load(path, new)
        np.testing.assert_array_equal(
            np.asarray(loaded.params["visual"]["conv1"]["kernel"]), 3.0)


class TestPruneEpochs:
    """SOLVER.CHECKPOINT_KEEP retention: only the newest N epoch_* dirs
    survive; 'best' and non-epoch names are never touched."""

    @staticmethod
    def _make_ckpt_dirs(root, names):
        import os

        for n in names:
            os.makedirs(os.path.join(root, n))
            with open(os.path.join(root, n + ".meta.json"), "w") as f:
                f.write("{}")

    def test_keeps_newest_n(self, tmp_path):
        import os

        from textreid_tpu.utils.checkpoint import Checkpointer

        root = str(tmp_path)
        self._make_ckpt_dirs(
            root, ["epoch_1", "epoch_2", "epoch_9", "epoch_10", "best"])
        ck = Checkpointer(save_dir=root, save_to_disk=True)
        ck.prune_epochs(2)
        left = sorted(d for d in os.listdir(root) if os.path.isdir(
            os.path.join(root, d)))
        # numeric order: epoch_9/epoch_10 are newest (not lexicographic)
        assert left == ["best", "epoch_10", "epoch_9"]
        assert not os.path.exists(os.path.join(root, "epoch_1.meta.json"))
        assert os.path.exists(os.path.join(root, "epoch_9.meta.json"))

    def test_zero_keeps_all(self, tmp_path):
        import os

        from textreid_tpu.utils.checkpoint import Checkpointer

        root = str(tmp_path)
        self._make_ckpt_dirs(root, ["epoch_1", "epoch_2"])
        Checkpointer(save_dir=root, save_to_disk=True).prune_epochs(0)
        assert sorted(os.listdir(root)) == [
            "epoch_1", "epoch_1.meta.json", "epoch_2", "epoch_2.meta.json"]

    def test_keep_larger_than_present(self, tmp_path):
        import os

        from textreid_tpu.utils.checkpoint import Checkpointer

        root = str(tmp_path)
        self._make_ckpt_dirs(root, ["epoch_1"])
        Checkpointer(save_dir=root, save_to_disk=True).prune_epochs(5)
        assert os.path.isdir(os.path.join(root, "epoch_1"))
