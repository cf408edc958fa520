"""Backend selection helper.

Some environments (e.g. this container's axon TPU plugin) force their
platform through ``jax.config`` at interpreter start, which overrides the
``JAX_PLATFORMS`` env var.  ``ensure_platform()`` re-asserts an explicit
env-var request through the config API; call it before the first
``jax.devices()`` (backends lock on first use).
"""

import os


def ensure_platform() -> None:
    requested = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in requested.split(","):
        import jax

        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass


def compute_dtype(cfg):
    """bf16 on TPU by default (TPU.COMPUTE_DTYPE), cfg.DTYPE elsewhere."""
    import jax
    import jax.numpy as jnp

    name = (cfg.TPU.COMPUTE_DTYPE if jax.default_backend() == "tpu"
            else cfg.DTYPE)
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def setup_compilation_cache(cfg) -> None:
    """Enable JAX's persistent compilation cache when
    ``TPU.COMPILATION_CACHE_DIR`` is set (empty = off, the default).

    First compile of the flagship train step is ~20-40 s on TPU; with the
    cache, restarts (preemption recovery, serving replica boots, repeated
    eval jobs) reload the compiled executable from disk instead.  Safe to
    share between hosts of one pod slice — entries are keyed by HLO,
    compile flags, and device kind.  The reference has no analogue (torch
    eager recompiles nothing, but also fuses nothing).
    """
    path = getattr(cfg.TPU, "COMPILATION_CACHE_DIR", "")
    if not path:
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compile that takes >=1 s — the per-phase jitted programs
    # all do; skip the sub-second helper jits that would bloat the dir.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import logging

    logging.getLogger("PersonSearch.platform").info(
        "Persistent compilation cache at %s", path)


def distributed_initialize() -> None:
    """``jax.distributed.initialize`` with explicit env-var fallbacks.

    Auto-detection covers TPU pods / managed clusters; for manual multi-host
    launches (the analogue of the reference's ``env://`` NCCL rendezvous,
    train_net.py:151-154) the coordinator/process topology comes from
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
    """
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()
