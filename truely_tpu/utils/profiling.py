"""Per-stage timing + device profiling.

The reference's only instrumentation is one wall-clock print around the
whole run (server/model.py:15,78-80; SURVEY.md §5).  Here:

- ``StageTimer`` accumulates named host-side stage durations (decode / H2D /
  device / temporal / encode) and reports a breakdown — the Detector's
  ``timings`` dict comes from this pattern.
- ``profile_trace`` wraps ``jax.profiler.trace`` so a TensorBoard-readable
  device trace can be captured around any pipeline section (availability
  depends on the platform plugin; errors degrade to a no-op).
- ``measure_forced`` is the library form of the only timing methodology
  that is valid on this runtime (PERFORMANCE.md "Methodology"):
  ``jax.block_until_ready`` does NOT synchronize non-scalar buffers on the
  remote-attached axon runtime, so dispatch-and-block times only dispatch.
  ``measure_forced`` chains iterations through a data dependency XLA cannot
  remove, forces the chain with one scalar fetch, and reports the slope
  between two chain lengths so the constant round-trip cost cancels.
- ``device_op_table`` / ``top_device_ops`` parse a ``jax.profiler`` Chrome
  trace into per-op device-time attribution (the analysis behind the
  PERFORMANCE.md breakdown tables and scripts/probes/probe_step_trace.py).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Iterator, List, Tuple


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, float]:
        return dict(self.totals)

    def summary(self) -> str:
        total = sum(self.totals.values())
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total else 0.0
            lines.append(
                f"{name:>10}: {t * 1000:9.1f} ms ({pct:4.1f}%) over "
                f"{self.counts[name]} calls"
            )
        return "\n".join(lines)


def _default_tap(out: Any) -> Any:
    """One scalar that data-depends on ``out`` (first element of the first
    array leaf)."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ndim")]
    if not leaves:
        raise ValueError("output has no array leaves to tap")
    leaf = leaves[0]
    return leaf[(0,) * leaf.ndim].astype(jnp.float32)


def _default_mix(arg: Any, tap: Any) -> Any:
    """Fold the scalar ``tap`` back into ``arg`` without changing its value
    (``x + tap * 0``), so step N cannot start before step N-1 finished.
    Applied to the first array leaf only — one serialized input suffices."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(arg)
    for i, leaf in enumerate(leaves):
        if not hasattr(leaf, "ndim") or leaf.dtype.kind == "b":
            continue
        zero = (tap * 0).astype(leaf.dtype)
        leaves[i] = leaf ^ zero if leaf.dtype.kind in "iu" else leaf + zero
        break
    else:
        raise ValueError("arg has no numeric array leaf to serialize on")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def measure_forced(
    step: Callable[[Any], Any],
    arg: Any,
    *,
    n_lo: int = 2,
    n_hi: int = 5,
    trials: int = 3,
    warmup: int = 2,
    tap: Callable[[Any], Any] = _default_tap,
    mix: Callable[[Any, Any], Any] = _default_mix,
) -> float:
    """Seconds per call of ``step(arg)``, measured with forced execution.

    Runs chains of ``n`` calls where each call's input mixes in a scalar
    tapped from the previous output (``mix``/``tap``), fetches one scalar
    from the final output to force the whole chain, and returns the best
    slope ``(t(n_hi) - t(n_lo)) / (n_hi - n_lo)`` over ``trials`` trials.
    This is the only pattern that measures execution (not dispatch) on
    runtimes where ``block_until_ready`` is a no-op for non-scalar buffers
    (PERFORMANCE.md "Methodology"; validated at 94% of a v5e's peak on a
    known matmul).
    """

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        a = arg
        t = None
        for _ in range(n):
            out = step(a)
            t = tap(out)
            a = mix(arg, t)
        float(t)  # scalar fetch: forces the chain
        return time.perf_counter() - t0

    for _ in range(warmup):
        chain(1)
    return min(
        (chain(n_hi) - chain(n_lo)) / (n_hi - n_lo) for _ in range(trials)
    )


def measure_ingraph(
    step: Callable[..., Any],
    *args: Any,
    n_lo: int = 2,
    n_hi: int = 10,
    trials: int = 3,
    carry_init: Any = None,
) -> float:
    """Seconds per call of ``step`` measured with an IN-GRAPH chain — the
    valid pattern for steps too small for ``measure_forced`` (sub-~10 ms
    on this rig the chained-dispatch slope measures the tunnel's
    per-dispatch floor, not the device; see PERFORMANCE.md "Methodology",
    small-step caveat).

    ``step(carry, tok, *args) -> (next_carry, next_tok)`` (``tok`` a
    float32 scalar) is called ``n`` times inside one jitted
    ``lax.fori_loop`` (one dispatch per chain).  CRITICAL for validity:
    ``step`` must thread ``tok`` into every heavy input it reads (e.g.
    write it into one pixel of the frames buffer with ``.at[...].set``;
    ``x + tok*0`` gets algebraically simplified away) — otherwise XLA
    hoists the loop-invariant work out of the loop and the slope
    reads ~0.  Returns the best slope between the
    ``n_lo`` and ``n_hi`` executables over ``trials`` trials.

    Anchor any new harness on a big step first: the ~56 ms full frame
    step measures within ~3% under both this and ``measure_forced``.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    # args flow through the jit as ARGUMENTS (not closure captures —
    # closed-over device arrays get baked into the graph as constants,
    # which bloats compiles for frame-sized inputs).
    def chain(carry, *xs, n):
        def body(i, c):
            carry, tok = c
            carry, tok = step(carry, tok, *xs)
            return (carry, tok)
        _, tok = jax.lax.fori_loop(0, n, body, (carry, jnp.float32(0)))
        return tok

    jits = {n: jax.jit(partial(chain, n=n)) for n in (n_lo, n_hi)}

    def run(n):
        t0 = time.perf_counter()
        float(jits[n](carry_init, *args))
        return time.perf_counter() - t0

    run(n_lo), run(n_hi), run(n_lo), run(n_hi)  # compile + warm
    return min(
        (run(n_hi) - run(n_lo)) / (n_hi - n_lo) for _ in range(trials)
    )


def device_op_table(
    trace_dir: str, *, device_substr: str = "TPU"
) -> List[Tuple[str, float, int]]:
    """Aggregate per-op device time from a ``jax.profiler`` Chrome trace.

    Scans ``trace_dir`` recursively for ``*.trace.json.gz``, keeps complete
    ("X") events whose pid's ``process_name`` metadata contains
    ``device_substr`` (e.g. ``/device:TPU:0``), and returns
    ``[(op_name, total_ms, count), ...]`` sorted by total time descending.
    Fusion/copy op names map back to source via
    ``jit(f).lower(x).compile().as_text()`` metadata.
    """
    events = []
    for path in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        trace_events = data.get("traceEvents", [])
        pid_ok = {
            e["pid"]
            for e in trace_events
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and device_substr in str(e.get("args", {}).get("name", ""))
        }
        events.extend(
            e
            for e in trace_events
            if e.get("ph") == "X" and e.get("pid") in pid_ok
        )
    agg: Dict[str, List[float]] = {}
    for e in events:
        bucket = agg.setdefault(e.get("name", "?"), [0.0, 0])
        bucket[0] += e.get("dur", 0) / 1e3
        bucket[1] += 1
    return sorted(
        ((name, ms, int(n)) for name, (ms, n) in agg.items()),
        key=lambda row: -row[1],
    )


def top_device_ops(
    trace_dir: str, top: int = 20, *, device_substr: str = "TPU"
) -> str:
    """Human-readable top-N table from :func:`device_op_table`."""
    rows = device_op_table(trace_dir, device_substr=device_substr)
    total = sum(ms for _, ms, _ in rows)
    lines = [f"total device op time: {total:.1f} ms over {len(rows)} op names"]
    lines += [
        f"  {ms:9.2f} ms  x{n:4d}  {name[:90]}" for name, ms, n in rows[:top]
    ]
    return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op on failure)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
