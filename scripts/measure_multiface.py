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
    h, w = 1080, 1920
    cfg = DetectorConfig(frame_batch=batch)
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
        f"1080p: {per*1e3:.1f} ms/step = {fps:.0f} sampled fps "
        f"= {fps * 4:.0f} video fps/chip",
        flush=True,
    )

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
