"""Persistent compilation cache (`utils/platform.py:
setup_compilation_cache`, TPU.COMPILATION_CACHE_DIR): restarts reload
compiled executables from disk instead of paying the first compile."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from textreid_tpu.config import get_default_cfg
from textreid_tpu.utils.platform import setup_compilation_cache


class TestCompilationCache:
    def test_off_by_default(self):
        cfg = get_default_cfg()
        assert cfg.TPU.COMPILATION_CACHE_DIR == ""
        setup_compilation_cache(cfg)  # no-op, must not raise

    def test_populates_cache_dir(self, tmp_path):
        cache = str(tmp_path / "jitcache")
        prev_min_compile = jax.config.jax_persistent_cache_min_compile_time_secs
        prev_min_entry = jax.config.jax_persistent_cache_min_entry_size_bytes
        cfg = get_default_cfg()
        cfg.TPU.COMPILATION_CACHE_DIR = cache
        setup_compilation_cache(cfg)
        try:
            # force a cacheable compile (min_compile_time_secs gates tiny
            # ones, so drop the threshold for the test)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)

            @jax.jit
            def f(x):
                return jnp.tanh(x @ x.T) * 3 + 1

            np.testing.assert_allclose(
                np.asarray(f(jnp.ones((32, 32)))),
                np.tanh(np.full((32, 32), 32.0)) * 3 + 1, rtol=1e-6)
            assert os.path.isdir(cache) and os.listdir(cache), (
                "compilation cache dir is empty after a jitted call")
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              prev_min_compile)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              prev_min_entry)
