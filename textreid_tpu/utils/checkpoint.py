"""Orbax-backed checkpointing.

Counterpart of `/root/reference/lib/utils/checkpoint.py` with the same
contract: primary-process-only writes (checkpoint.py:28-45 +
train_net.py:62-63), ``best`` / ``epoch_N`` naming
(trainer.py:128,131), weights-only ``load`` vs full ``resume``
(checkpoint.py:47-71), and training-progress kwargs round-tripped beside
the state (train_net.py:58-59,71-72).  Saves are atomic (orbax writes to a
temp dir and renames), which provides the preemption safety the reference
delegated to HTCondor checkpointing (SURVEY.md section 5.3).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(
        self,
        save_dir: str = "",
        save_to_disk: Optional[bool] = None,
        logger: Optional[logging.Logger] = None,
    ):
        self.save_dir = os.path.abspath(save_dir) if save_dir else ""
        if save_to_disk is None:
            save_to_disk = jax.process_index() == 0
        self.save_to_disk = save_to_disk
        self.logger = logger or logging.getLogger("PersonSearch.checkpoint")
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def save(self, name: str, state: Any, **kwargs) -> None:
        if not self.save_dir or not self.save_to_disk:
            return
        path = self._path(name)
        self.logger.info("Saving checkpoint to %s", path)
        self._ckptr.save(path, jax.device_get(state), force=True)
        with open(path + ".meta.json", "w") as f:
            json.dump(kwargs, f)

    def load(self, path: str, state: Any) -> Any:
        """Weights-only load: restore params/batch_stats/constants (and MoCo
        key params) into ``state``; optimizer/progress untouched."""
        restored = self._restore(path, state)
        keep = {"params", "batch_stats", "constants", "key_params",
                "key_batch_stats"}
        updates = {
            k: getattr(restored, k)
            for k in keep
            if getattr(restored, k, None) is not None
        }
        return state.replace(**updates)

    def resume(self, path: str, state: Any) -> tuple:
        """Full resume: the entire TrainState plus the progress kwargs dict."""
        restored = self._restore(path, state)
        meta = {}
        meta_path = os.path.abspath(path) + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return restored, meta

    def _restore(self, path: str, state: Any) -> Any:
        path = os.path.abspath(path)
        self.logger.info("Loading checkpoint from %s", path)
        target = jax.device_get(state)
        return self._ckptr.restore(path, item=target)

    def has_checkpoint(self, name: str) -> bool:
        return bool(self.save_dir) and os.path.isdir(self._path(name))
