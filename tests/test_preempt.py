"""Preemption-safe training (`utils/preempt.py` + the trainer's
log-boundary poll): SIGTERM -> 'preempt' checkpoint -> exit 0 ->
`--resume-from auto` resumes from it when it is the newest state."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from tests.test_cli import REPO, workspace  # noqa: F401 (fixture)
from textreid_tpu.utils.preempt import PreemptionGuard


class TestPreemptionGuard:
    def test_trip_sets_triggered(self):
        g = PreemptionGuard(enabled=False)
        assert not g.triggered
        g.trip()
        assert g.triggered
        # single-process consensus == local flag
        assert g.triggered_global()

    def test_install_and_uninstall(self):
        prev = signal.getsignal(signal.SIGTERM)
        g = PreemptionGuard(enabled=True)
        assert g.installed
        assert signal.getsignal(signal.SIGTERM) == g._handle
        g.uninstall()
        assert signal.getsignal(signal.SIGTERM) in (prev, signal.SIG_DFL)

    def test_sigterm_sets_flag(self):
        g = PreemptionGuard(enabled=True)
        try:
            os.kill(os.getpid(), signal.SIGTERM)
            deadline = time.time() + 5
            while not g.triggered and time.time() < deadline:
                time.sleep(0.01)
            assert g.triggered
        finally:
            g.uninstall()


@pytest.mark.slow
class TestPreemptCLI:
    def test_sigterm_saves_and_resume_completes(self, workspace):  # noqa: F811
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["TEXTREID_FORCE_CPU"] = "1"
        out_dir = workspace / "output" / "tiny" / "smoke"
        args = [
            sys.executable, os.path.join(REPO, "train_net.py"),
            "--root", str(workspace),
            "--config-file", "configs/tiny/smoke.yaml",
            "SOLVER.NUM_EPOCHS", "30", "SOLVER.EVALUATE_PERIOD", "0",
        ]
        # child output goes to a file, not a PIPE: the poll loop below
        # doesn't drain, and a filled 64 KB pipe would block the child's
        # log writes before it ever reaches the epoch boundary.
        log_path = workspace / "preempt_child.log"
        with open(log_path, "w") as log_f:
            proc = subprocess.Popen(args, cwd=str(workspace), env=env,
                                    stdout=log_f, stderr=subprocess.STDOUT,
                                    text=True)
            # wait until an epoch boundary has committed, then signal
            deadline = time.time() + 600
            while time.time() < deadline:
                if (out_dir / "epoch_1.meta.json").exists():
                    break
                if proc.poll() is not None:
                    raise AssertionError(
                        "train exited early:\n"
                        + log_path.read_text()[-4000:])
                time.sleep(0.5)
            else:
                proc.kill()
                raise AssertionError("no epoch checkpoint within deadline")
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=300)
        stdout = log_path.read_text()
        assert proc.returncode == 0, stdout[-4000:]
        assert "Preemption signal" in stdout
        assert (out_dir / "preempt").is_dir()
        meta = json.loads((out_dir / "preempt.meta.json").read_text())
        assert meta["iteration"] >= 1

        # resume must pick the preempt checkpoint and run to completion
        result = subprocess.run(
            args[:6] + ["--resume-from", "auto",
                        "SOLVER.NUM_EPOCHS", str(meta["epoch"] + 1),
                        "SOLVER.EVALUATE_PERIOD", "0"],
            cwd=str(workspace), env=env, capture_output=True, text=True,
            timeout=900,
        )
        combined = result.stdout + result.stderr
        assert result.returncode == 0, combined[-4000:]
        assert "Auto-resuming from" in combined
        assert os.path.join("smoke", "preempt") in combined
        assert "Total training time" in combined
        # the resume honored THIS run's NUM_EPOCHS, not the max_epoch
        # frozen into the preempt meta (which said 30): training stopped
        # exactly at the overridden budget.
        final = meta["epoch"] + 1
        assert (out_dir / f"epoch_{final}.meta.json").exists()
        assert not (out_dir / f"epoch_{final + 1}").exists()


PREEMPT_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
from textreid_tpu.utils.preempt import PreemptionGuard

g = PreemptionGuard(enabled=False)
# before anyone trips: consensus must be False on BOTH processes
assert g.triggered_global() is False
# only process 0 is "signalled" — consensus must still be True on BOTH
if jax.process_index() == 0:
    g.trip()
assert g.triggered_global() is True, "consensus failed on p%d" % (
    jax.process_index(),)
print("RESULT PREEMPT_CONSENSUS_OK", jax.process_index())
"""


@pytest.mark.slow
class TestPreemptConsensus2Proc:
    def test_one_signalled_process_stops_both(self):
        from tests.test_multihost import _run_workers

        outs = _run_workers(PREEMPT_WORKER)
        for out in outs:
            assert "RESULT PREEMPT_CONSENSUS_OK" in out
