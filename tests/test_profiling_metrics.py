import os
import time

import jax
import pytest

from certifiedgpt_tpu.common.config import ConfigNode
from certifiedgpt_tpu.common.metrics import TPUMetrics, jit_cache_size
from certifiedgpt_tpu.common.profiling import Profiler


def test_tpu_metrics_log_and_compile_counter(tmp_path):
    metrics = TPUMetrics(str(tmp_path), "unit")
    fn = jax.jit(lambda x: x * 2)
    metrics.track("fn", fn)
    assert jit_cache_size(fn) == 0
    fn(jax.numpy.ones((2, 2)))
    assert jit_cache_size(fn) == 1
    metrics.log_step_metrics("train", epoch=0, step=3, loss=1.25, lr=1e-4)
    metrics.log_event("checkpoint_saved")
    content = (tmp_path / "unit.txt").read_text()
    assert "split=train epoch=0 step=3 loss=1.250000" in content
    assert "compiles[fn]=1" in content
    assert "event=checkpoint_saved" in content


def test_profiler_trace_window(tmp_path):
    run_cfg = ConfigNode(
        {
            "enable_profile": True,
            "profile_logdir": str(tmp_path / "trace"),
            "profile_epoch": 0,
            "profile_step": 1,
            "duration_ms": 200,
        }
    )
    profiler = Profiler(run_cfg)
    profiler.maybe_start(epoch=0, step=0)  # wrong step: no trace
    assert not profiler._tracing
    profiler.maybe_start(epoch=0, step=1)
    if not profiler._tracing:
        # another process/test may hold the jax profiler (it is global);
        # the wiring under test is the start/stop plumbing, so skip
        pytest.skip("jax profiler unavailable (already active elsewhere)")
    # run something under the trace, then stop explicitly (the duration_ms
    # Timer calls this same stop(); racing the timer is flaky under a
    # loaded test machine)
    jax.numpy.sum(jax.numpy.ones((64, 64))).block_until_ready()
    profiler.stop()
    assert not profiler._tracing
    profiler.stop()  # idempotent
    # a trace directory was produced
    assert os.path.isdir(tmp_path / "trace")


def test_profiler_disabled_noop():
    profiler = Profiler(ConfigNode({"enable_profile": False}))
    profiler.maybe_start(0, 0)
    assert not profiler._tracing
    profiler.stop()


def test_metrics_remount_retry(tmp_path, monkeypatch):
    """A failed metrics write remounts the output dir once and retries
    (ref common/metrics.py:37-38 gcsfuse auto-remount)."""
    import shutil

    from certifiedgpt_tpu.common.metrics import TPUMetrics
    from certifiedgpt_tpu.utils import gcs

    out = tmp_path / "bucket" / "run"
    metrics = TPUMetrics(str(out), "m")
    shutil.rmtree(tmp_path / "bucket")  # simulate an unmounted bucket

    calls = []

    def fake_mount(path, bucket_name="certifiedgpt_storage"):
        calls.append(path)
        os.makedirs(path, exist_ok=True)

    monkeypatch.setattr(gcs, "ensure_mounted", fake_mount)
    metrics.log_event("after_remount")
    assert calls, "remount was not attempted"
    assert "after_remount" in (out / "m.txt").read_text()
