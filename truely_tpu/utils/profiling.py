"""Per-stage timing + device profiling.

The reference's only instrumentation is one wall-clock print around the
whole run (server/model.py:15,78-80; SURVEY.md §5).  Here:

- ``StageTimer`` accumulates named host-side stage durations (decode / H2D /
  device / temporal / encode) and reports a breakdown — the Detector's
  ``timings`` dict comes from this pattern.
- ``profile_trace`` wraps ``jax.profiler.trace`` so a TensorBoard-readable
  device trace can be captured around any pipeline section (availability
  depends on the platform plugin; errors degrade to a no-op).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


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
