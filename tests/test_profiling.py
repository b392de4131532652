"""StepTimer / trace utility tests."""

import jax.numpy as jnp

from pointnet_autoencoder_tpu.utils.profiling import StepTimer, trace


def test_step_timer_records_and_summarizes():
    t = StepTimer()
    for _ in range(5):
        with t.step() as box:
            box["result"] = jnp.ones((4,)) * 2
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_ms"] > 0
    assert s["p50_ms"] <= s["p99_ms"]
    t.reset()
    assert t.summary() == {}


def test_trace_noop_without_dir():
    with trace(None):
        pass
    with trace(""):
        pass


def test_trace_writes(tmp_path):
    with trace(str(tmp_path / "tr")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert (tmp_path / "tr").exists()


def test_step_timer_stop_without_start_raises():
    """Misuse (stop with no start, or double stop) must raise, not record
    a ~0 sample that silently drags the percentile summary toward zero."""
    import pytest

    from pointnet_autoencoder_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with pytest.raises(RuntimeError, match="without a matching start"):
        t.stop()
    t.start()
    t.stop()
    with pytest.raises(RuntimeError, match="without a matching start"):
        t.stop()
    assert t.summary()["steps"] == 1
