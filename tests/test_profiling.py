"""StageTimer / profiler-wrapper unit tests."""

import time

from truely_tpu.utils.profiling import StageTimer, profile_trace


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    report = t.report()
    assert report["a"] >= 0.01
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    summary = t.summary()
    assert "a" in summary and "b" in summary and "%" in summary


def test_stage_timer_records_on_exception():
    t = StageTimer()
    try:
        with t.stage("x"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert t.counts["x"] == 1


def test_profile_trace_noop_on_failure(tmp_path):
    # Must never raise even if the platform can't trace.
    with profile_trace(str(tmp_path / "trace")):
        pass
