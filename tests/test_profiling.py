"""StageTimer / forced-execution timer / trace-parser unit tests."""

import gzip
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from truely_tpu.utils.profiling import (
    StageTimer,
    device_op_table,
    measure_forced,
    profile_trace,
    top_device_ops,
)


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


def test_measure_forced_float_arg():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64), jnp.float32)
    # The slope of a microsecond-scale op is noise-dominated on CPU; assert
    # the machinery runs and returns a finite number (sign checked on real
    # workloads by bench.py, which shares this pattern).
    per = measure_forced(f, x, n_lo=1, n_hi=3, trials=2, warmup=1)
    assert np.isfinite(per)


def test_measure_forced_uint8_arg_preserves_value():
    # The mix must serialize without perturbing the input (x ^ 0 == x for
    # integer frames), so chained steps compute on the real data.
    calls = []

    def f(x):
        calls.append(np.asarray(x))
        return jnp.sum(x).reshape(())

    x = jnp.asarray(np.arange(24, dtype=np.uint8).reshape(2, 3, 4))
    per = measure_forced(f, x, n_lo=1, n_hi=2, trials=1, warmup=1)
    assert np.isfinite(per)
    for seen in calls:
        np.testing.assert_array_equal(seen, np.asarray(x))


def test_measure_forced_pytree_arg():
    def f(tree):
        return {"y": tree["a"] * 2.0 + tree["b"]}

    arg = {"a": jnp.ones((4,)), "b": jnp.zeros((4,))}
    per = measure_forced(jax.jit(f), arg, n_lo=1, n_hi=2, trials=1, warmup=1)
    assert np.isfinite(per)


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_device_op_table_filters_and_aggregates(tmp_path):
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "python host threads"}},
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 2000},
        {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 1000},
        {"ph": "X", "pid": 7, "name": "copy.3", "dur": 500},
        {"ph": "X", "pid": 9, "name": "hostloop", "dur": 99999},
        {"ph": "B", "pid": 7, "name": "notcomplete", "dur": 99999},
    ]
    rows = device_op_table(_write_trace(tmp_path, events))
    assert rows == [("fusion.1", 3.0, 2), ("copy.3", 0.5, 1)]
    table = top_device_ops(str(tmp_path), top=1)
    assert "fusion.1" in table and "hostloop" not in table


def test_device_op_table_empty_dir(tmp_path):
    assert device_op_table(str(tmp_path)) == []


def test_measure_ingraph_positive_slope_and_chains():
    """The in-graph chain timer (PERFORMANCE.md small-step caveat): a step
    that threads the carry token into its heavy input measures a positive
    finite per-step time, and the chain really executes n times (the
    carry accumulates)."""
    import jax.numpy as jnp

    from truely_tpu.utils.profiling import measure_ingraph

    w = jnp.eye(128, dtype=jnp.float32)

    def step(carry, tok, w):
        x = carry.at[0, 0].set(tok)          # token -> heavy input: no hoist
        y = x @ w + 1.0
        return y, y[0, 0]

    x0 = jnp.zeros((128, 128), jnp.float32)
    per = measure_ingraph(step, w, carry_init=x0, n_lo=2, n_hi=10, trials=2)
    assert 0.0 < per < 1.0

    # Chain-length semantics: n iterations of the same step really ran.
    import jax
    from functools import partial

    def chain(carry, n):
        def body(i, c):
            carry, tok = c
            return step(carry, tok, w)[0], step(carry, tok, w)[1]
        carry, tok = jax.lax.fori_loop(0, n, body, (carry, jnp.float32(0)))
        return carry

    out = jax.jit(partial(chain, n=3))(x0)
    assert float(out[1, 1]) == 3.0  # +1.0 per iteration, off the token path
