"""Profiling/observability utility tests (SURVEY.md section 5.1-5.2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from textreid_tpu.utils.meters import MetricLogger, SmoothedValue
from textreid_tpu.utils.profiling import live_memory, nan_check, step_timer


class TestNanCheck:
    def test_passes_on_finite_tree(self):
        nan_check({"a": jnp.ones(3), "b": {"c": jnp.zeros((2, 2))}})

    def test_raises_on_nan_with_path(self):
        tree = {"ok": jnp.ones(2), "bad": jnp.array([1.0, float("nan")])}
        with pytest.raises(FloatingPointError, match="bad"):
            nan_check(tree, where="unit-test")

    def test_ignores_integer_leaves(self):
        nan_check({"ids": jnp.array([1, 2, 3], jnp.int32)})


class TestStepTimer:
    def test_records_elapsed_into_meters(self):
        meters = MetricLogger()
        with step_timer(meters, name="step") as holder:
            holder["result"] = jnp.ones(4) * 2
        assert meters.meters["step"].count == 1
        assert holder["elapsed"] >= 0


class TestLiveMemory:
    def test_reports_per_device(self):
        out = live_memory()
        assert len(out) >= 1
        assert all(isinstance(v, int) for v in out.values())


class TestSmoothedValue:
    def test_median_and_averages(self):
        m = SmoothedValue(window_size=3)
        for v in (1.0, 2.0, 3.0, 4.0):
            m.update(v)
        assert m.median == 3.0  # window holds 2,3,4
        assert m.avg == 3.0
        assert m.global_avg == 2.5

    def test_even_window_median(self):
        m = SmoothedValue(window_size=4)
        for v in (1.0, 2.0, 3.0, 4.0):
            m.update(v)
        assert m.median == 2.5
