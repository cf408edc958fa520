"""Preemption-safe training: SIGTERM -> synchronized checkpoint -> exit 0.

TPU VMs receive SIGTERM with a short grace window on maintenance events
and spot reclamation.  The reference has no preemption story beyond its
epoch checkpoints (`lib/utils/checkpoint.py`); here the trainer polls a
:class:`PreemptionGuard` at its existing log-boundary host syncs, saves a
``preempt`` checkpoint (meta pinned to re-run the interrupted epoch), and
returns cleanly — `train_net.py --resume-from auto` then prefers that
checkpoint when it is newer than the last epoch boundary.

Multi-host: orbax saves are collective, so every process must agree on
WHEN to stop.  ``triggered_global()`` reaches consensus by allgathering
the per-host flag (processes poll at the same loop position, so the
collective lines up); a host that was not signalled still participates.
"""

from __future__ import annotations

import logging
import signal
import threading


class PreemptionGuard:
    """Installs a SIGTERM handler that records the request.

    ``enabled=False`` (or installation from a non-main thread, where
    CPython forbids ``signal.signal``) degrades to an inert guard —
    ``triggered`` stays False unless :meth:`trip` is called (tests).
    """

    def __init__(self, enabled: bool = True):
        self._flag = threading.Event()
        self.installed = False
        self._prev = None
        if not enabled:
            return
        try:
            self._prev = signal.signal(signal.SIGTERM, self._handle)
            self.installed = True
        except ValueError:
            logging.getLogger("PersonSearch.preempt").warning(
                "Not on the main thread; SIGTERM checkpointing disabled")

    def _handle(self, signum, frame):
        self._flag.set()

    def trip(self) -> None:
        """Mark as triggered (tests / programmatic shutdown)."""
        self._flag.set()

    @property
    def triggered(self) -> bool:
        return self._flag.is_set()

    def triggered_global(self) -> bool:
        """Consensus across processes: True iff ANY host was signalled.

        Single-process reads the local flag; multi-process allgathers one
        int32 per host (a few microseconds on ICI, and the caller only
        polls at log boundaries where it already syncs with the device).
        """
        import jax

        if jax.process_count() == 1:
            return self.triggered
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([int(self.triggered)], np.int32))
        return bool(np.any(flags))

    def uninstall(self) -> None:
        """Restore the previous SIGTERM handler (end of training)."""
        if self.installed:
            signal.signal(signal.SIGTERM, self._prev or signal.SIG_DFL)
            self.installed = False
