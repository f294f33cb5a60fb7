#!/usr/bin/env python3
"""Chip-side cost of the MULTI-FACE StreamScheduler steps (configs 4 x 5
composed — VERDICT r4 task 1's measured line).

Measures, at the streaming batch (default b32 = 8 streams x 4
frames/stream, 1080p, the BASELINE config-5 shape):

- the full multi-face step (`_multiface_step`) — what every scheduler
  step runs in plain multi-face mode and every K-th step runs in
  propagate mode, and
- the all-rows (S, T)-seeded refine step (`_multiface_step_refine`) —
  what the steps between keyframes run at detect_interval = K,

then reports the K=4-blended step cost and the implied concurrent
1080p60-stream ceiling per chip at the 7 Hz law (each stream needs
60/8 = 7.5 sampled fps).

METHODOLOGY (round-5 correction): the chained-dispatch slope
(utils.profiling.measure_forced) is only valid for steps big enough to
hide the tunnel's per-dispatch latency — for the sub-10 ms refine step
it measures the dispatch floor, not the device (observed 3-27 ms
phantom readings across windows for a step whose true cost is ~8 ms).
Small steps are timed here with an IN-GRAPH chain instead: one jit runs
n steps in a lax.fori_loop, each iteration seeded by the previous
iteration's own output boxes AND reading a frames buffer with one pixel
rewritten from the carry (defeating XLA's loop-invariant hoisting of
the full-frame prep), so a single dispatch covers the whole chain and
the slope over n is pure device time.  The full step is timed both ways
— the two agree within ~3% (55.5 vs 57.9 ms), anchoring the harness.

Run on TPU: timeout 560 python scripts/measure_multiface_stream.py
            [--batch 32] [--streams 8] [--k 4]
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from truely_tpu.config import DetectorConfig
from truely_tpu.pipeline.detector import (
    Detector, _multiface_step, _multiface_step_refine,
)
from truely_tpu.utils.profiling import measure_forced, measure_ingraph


def main():
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 32
    streams = int(sys.argv[sys.argv.index("--streams") + 1]) \
        if "--streams" in sys.argv else 8
    k = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 4
    h, w = 1080, 1920
    rows = batch // streams

    cfg = DetectorConfig(frame_batch=batch, multi_face=True,
                         detect_interval=k)
    det = Detector(cfg)
    t = cfg.max_tracks
    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, h, w, 3), np.uint8)))
    jax.block_until_ready(frames)

    # Full step: big enough for the dispatch-chain slope (the in-graph
    # harness agrees within ~3% — see module docstring).
    full = jax.jit(partial(
        _multiface_step, det.params, cfg=cfg,
        compute_dtype=det._compute_dtype,
    ))
    per_full = measure_forced(
        lambda x: full(x)[2], frames, n_lo=2, n_hi=5, trials=3,
    )
    print(
        f"multiface FULL scheduler step b{batch} 1080p: "
        f"{per_full*1e3:.1f} ms = {batch/per_full:.0f} sampled fps/chip",
        flush=True,
    )

    # Refine step: in-graph chain (sub-10 ms — dispatch-chain invalid).
    seeds = jnp.asarray(rng.uniform(100, 500, (streams, t, 4)), jnp.float32)
    sv = jnp.ones((streams, t), bool)

    def refine_step(carry, tok, params, frames):
        seeds, sv = carry
        # token -> one input pixel: the full-frame prep can't hoist
        f = frames.at[0, 0, 0, 0].set(
            (tok.astype(jnp.int32) % 256).astype(jnp.uint8)
        )
        boxes, valid, emb = _multiface_step_refine(
            params, f, seeds, sv, cfg, det._compute_dtype, rows)
        return (boxes[:streams], valid[:streams]), emb[0, 0, 0]

    per_ref = measure_ingraph(
        refine_step, det.params, frames, carry_init=(seeds, sv),
    )
    blended = (per_full + (k - 1) * per_ref) / k
    fps = batch / blended
    # Per-stream need at the 7 Hz law on 1080p60: 60/8 = 7.5 sampled fps.
    print(
        f"multiface REFINE scheduler step ({streams} streams x {rows} "
        f"rows, T={t}) b{batch} 1080p: {per_ref*1e3:.1f} ms (in-graph "
        f"chain) = {batch/per_ref:.0f} sampled fps/chip; K={k} blended "
        f"{blended*1e3:.1f} ms = {fps:.0f} sampled fps/chip "
        f"=> ~{fps/7.5:.0f} concurrent 1080p60 multi-face streams/chip "
        f"at the 7 Hz law ({batch/per_full/7.5:.0f} at full detection, "
        f"{batch/per_ref/7.5:.0f} at the pure-refine limit)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
