"""Profiling and numerical-debugging utilities.

The reference's only observability is wall-clock meters and CUDA max-mem in
the train log (`/root/reference/lib/engine/trainer.py:73,93-95,117`).
TPU-native equivalents (SURVEY.md section 5.1-5.2):

* ``profile_trace`` — a context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XPlane trace of device execution;
* ``step_timer`` — ``block_until_ready``-bracketed wall timing of a jitted
  step (XLA dispatch is async; un-bracketed timing measures dispatch);
* ``nan_check`` — ``jax.debug_nans``-style validation of a pytree, used by
  tests and available behind ``TPU`` config knobs;
* ``live_memory`` — per-device live-buffer accounting (the max-mem analogue).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(meters=None, name: str = "time"):
    """Wall-time a block including device completion of its outputs."""
    start = time.time()
    holder = {}
    try:
        yield holder
    finally:
        if "result" in holder:
            jax.block_until_ready(holder["result"])
        elapsed = time.time() - start
        holder["elapsed"] = elapsed
        if meters is not None:
            meters.update(**{name: elapsed})


def nan_check(tree: Any, where: str = "") -> None:
    """Raise if any leaf holds NaN/Inf (host-side; call sparingly)."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(
            f"Non-finite values{' in ' + where if where else ''}: {bad[:10]}"
        )


def live_memory() -> Dict[str, int]:
    """Bytes of live device buffers per device (max-mem log analogue)."""
    out: Dict[str, int] = {}
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
            out[str(dev)] = int(stats.get("bytes_in_use", 0)) if stats else 0
        except Exception:
            out[str(dev)] = -1
    return out
