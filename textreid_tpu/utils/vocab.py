"""Frozen token-embedding table loading.

Counterpart of `/root/reference/lib/utils/directory.py:11-30`: selects the
``.npy`` lookup table by mode.  These tables (e.g. CLIP's token embedding
exported as ``clip_vocab_vit.npy``) feed the bi-GRU when
``MODEL.GRU.ONEHOT != "yes"``.
"""

from __future__ import annotations

import os

import numpy as np

_VOCAB_FILES = {
    "bert_c4": "datasets/cuhkpedes/bert_vocab_c4.npy",
    "bert_l2": "datasets/cuhkpedes/bert_vocab_l2.npy",
    "clip_vit": "datasets/cuhkpedes/clip_vocab_vit.npy",
    "clip_rn50x4": "datasets/cuhkpedes/clip_vocab_rn50x4.npy",
}


def load_vocab_dict(root: str, use_onehot: str) -> np.ndarray:
    if use_onehot not in _VOCAB_FILES:
        raise NotImplementedError(f"Unknown vocab mode: {use_onehot}")
    path = os.path.join(root, _VOCAB_FILES[use_onehot])
    return np.load(path)


def frozen_table_initializer(cfg):
    """Return a lazy loader for the frozen table, or None for learnable
    embeddings (reference gru.py:24-34 semantics).

    When the table file is missing this *raises* rather than letting the
    model silently substitute a random table (a mistyped ``--root`` would
    otherwise train to garbage).  ``cfg.TPU.ALLOW_RANDOM_VOCAB`` is the
    explicit opt-out for tests/synthetic runs.
    """
    if cfg.MODEL.TEXTUAL_MODEL in ("transformer", "clip_transformer"):
        # The frozen CLIP token table is a GRU-branch concept
        # (gru.py:24-34); the transformer tower owns its token embedding
        # (warm-started from the CLIP archive, models/text_transformer.py).
        # Any other value (bigru, the reference's default "bilstm", ...)
        # keeps the table contract, including its missing-file hard error.
        return None
    mode = cfg.MODEL.GRU.ONEHOT
    if mode == "yes":
        return None
    if mode not in _VOCAB_FILES:
        raise NotImplementedError(f"Unknown vocab mode: {mode}")
    root = cfg.ROOT
    path = os.path.join(root, _VOCAB_FILES[mode])
    if not os.path.exists(path):
        if cfg.TPU.ALLOW_RANDOM_VOCAB:
            import logging

            logging.getLogger("PersonSearch.vocab").warning(
                "Frozen vocab table %s is missing; TPU.ALLOW_RANDOM_VOCAB "
                "substitutes a FIXED RANDOM table — synthetic runs only.",
                path,
            )
            return None
        raise FileNotFoundError(
            f"MODEL.GRU.ONEHOT={mode!r} requires the frozen token-embedding "
            f"table at {path} (see DATA.md). Check --root, or set "
            f"TPU.ALLOW_RANDOM_VOCAB True to run with a random table "
            f"(synthetic/smoke runs only)."
        )
    return lambda: load_vocab_dict(root, mode)
