"""Forced-execution measurement of the multi-face pipeline (BASELINE
config 4): `_multiface_step` (cascade + top-max_tracks crops + embeds) and
the `_track_fold` association/scan step, at 1080p on the real chip.

Uses truely_tpu.utils.profiling.measure_forced — the slope-based chained
timer (PERFORMANCE.md "Methodology").  Run foreground, one TPU process,
under `timeout 560`.
"""
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.config import DetectorConfig  # noqa: E402
from truely_tpu.pipeline.detector import (  # noqa: E402
    Detector, _multiface_step,
)
from truely_tpu.utils.profiling import measure_forced  # noqa: E402


def main():
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 128
    k = int(sys.argv[sys.argv.index("--propagate") + 1]) \
        if "--propagate" in sys.argv else 0
    h, w = (
        map(int, sys.argv[sys.argv.index("--res") + 1].split("x"))
        if "--res" in sys.argv else (1080, 1920)
    )
    cfg = DetectorConfig(frame_batch=batch,
                         detect_interval=max(1, k), multi_face=bool(k))
    det = Detector(cfg)
    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, h, w, 3), np.uint8)))
    jax.block_until_ready(frames)

    step = jax.jit(partial(
        _multiface_step, det.params,
        cfg=cfg, compute_dtype=det._compute_dtype,
    ))
    per = measure_forced(
        lambda x: step(x)[2], frames, n_lo=2, n_hi=5, trials=3,
    )
    fps = batch / per
    print(
        f"multiface step (cascade + top-{cfg.max_tracks} embeds) b{batch} "
        f"{h}p: {per*1e3:.1f} ms/step = {fps:.0f} sampled fps "
        f"= {fps * 4:.0f} video fps/chip",
        flush=True,
    )

    if k:
        # Track-propagated multi-face: keyframe rows pass seeds through,
        # the K-1 rows between run T-seed stage-2/3 refinement only
        # (_multiface_step_propagate).  Seeds here are synthetic plausible
        # boxes — the graph cost is shape-, not value-, dependent.
        from truely_tpu.pipeline.detector import _multiface_step_propagate

        t = cfg.max_tracks
        seeds = jax.device_put(jnp.asarray(
            rng.uniform(100, 500, (batch // k, t, 4)), jnp.float32))
        sv = jax.device_put(jnp.ones((batch // k, t), bool))
        pstep = jax.jit(partial(
            _multiface_step_propagate, det.params,
            seed_boxes=seeds, seed_valid=sv,
            cfg=cfg, compute_dtype=det._compute_dtype,
        ))
        per_p = measure_forced(
            lambda x: pstep(frames=x)[2], frames, n_lo=2, n_hi=5, trials=3,
        )
        fps_p = batch / per_p
        # Macro-cycle accounting (_propagate_m_outputs): per cycle of K
        # segments, ONE cascade-only seed step on the gathered keyframe
        # batch (round 5: _multiface_detect — the embed tail's outputs
        # were discarded there, advisor r4) plus one propagate step per
        # segment => amortized per-segment cost (per_det + K*per_prop)/K.
        from truely_tpu.pipeline.detector import _multiface_detect

        dstep = jax.jit(partial(
            _multiface_detect, det.params,
            cfg=cfg, compute_dtype=det._compute_dtype,
        ))
        per_d = measure_forced(
            lambda x: dstep(x)[0], frames, n_lo=2, n_hi=5, trials=3,
        )
        amort = (per_d + k * per_p) / k
        amort_full = (per + k * per_p) / k
        print(
            f"multiface PROPAGATE step (T-seed refine, K={k}) b{batch} "
            f"{h}p: {per_p*1e3:.1f} ms/step = {fps_p:.0f} sampled fps; "
            f"cascade-only keyframe seed step {per_d*1e3:.1f} ms; "
            f"macro-cycle amortized {amort*1e3:.1f} ms/segment "
            f"= {batch/amort:.0f} sampled fps "
            f"= {4*batch/amort:.0f} video fps/chip "
            f"(was {amort_full*1e3:.1f} ms with full-step keyframes)",
            flush=True,
        )
        return

    det._ensure_track_jits()
    from truely_tpu.pipeline.tracks import init_track_state
    state = init_track_state(cfg.max_tracks, 512)
    boxes, valid, emb = jax.block_until_ready(step(frames))

    def fold(e):
        s, _ = det._track_fold(state, boxes, valid, e, jnp.int32(batch))
        return s.embedding
    per_fold = measure_forced(fold, emb, n_lo=2, n_hi=8, trials=3)
    print(f"track fold (associate + per-track scan) b{batch}: "
          f"{per_fold*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
