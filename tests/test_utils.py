"""Utilities: stage timers, NaN guard, distributed init no-op."""

import time

import numpy as np
import pytest

from fennec_tpu.utils import StageTimer, device_trace, nan_check


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("b"):
            pass
        assert t.counts["a"] == 2
        assert t.totals["a"] >= 0.02
        report = t.report()
        assert "a" in report and "b" in report

    def test_exception_still_recorded(self):
        t = StageTimer()
        with pytest.raises(ValueError):
            with t.stage("x"):
                raise ValueError("boom")
        assert t.counts["x"] == 1


class TestNanCheck:
    def test_clean_passes(self):
        nan_check("ok", np.ones(4), np.zeros((2, 2)))

    def test_nan_raises(self):
        with pytest.raises(FloatingPointError):
            nan_check("bad", np.array([1.0, np.nan]))

    def test_inf_raises(self):
        with pytest.raises(FloatingPointError):
            nan_check("bad", np.array([np.inf]))


class TestDeviceTrace:
    def test_noop_without_dir(self):
        with device_trace(None):
            pass

    def test_writes_trace(self, tmp_path):
        import jax.numpy as jnp
        with device_trace(str(tmp_path)):
            jnp.ones(8).sum().block_until_ready()
        # jax profiler lays down a plugins/ or .pb tree
        assert any(tmp_path.rglob("*"))


class TestDistributed:
    def test_single_host_noop(self):
        from fennec_tpu.parallel.distributed import (
            global_data_mesh,
            initialize_distributed,
        )
        initialize_distributed()  # must not raise on single host
        mesh = global_data_mesh()
        assert mesh.devices.size >= 1
