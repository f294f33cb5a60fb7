#!/usr/bin/env python3
"""Headline benchmark: sampled-frame throughput of the full device pipeline
(MTCNN cascade + face crop + FaceNet embed + temporal fold) at 1080p on one
chip.

North star (BASELINE.json): a 60 s 1080p30 video (1800 frames) analyzed in
< 2 s wall-clock on one v5e chip => >= 900 frames/sec/chip; at the
reference's ~7 Hz sampling (every 4th frame at 30 fps) that is 225 sampled
(fully processed) frames/sec.  We report *video* frames/sec/chip — sampled
throughput x sample interval — so the number is directly comparable to the
north star; vs_baseline = value / 900.

Methodology note (sync-verified): on this rig the TPU is remote-attached
(axon tunnel) and ``jax.block_until_ready`` does NOT synchronize non-scalar
buffers — dispatching N steps and blocking once times only dispatch (a
137-GFLOP matmul "took" 0.02 ms that way).  Execution IS forced by fetching
a scalar that data-depends on the computation: chaining the temporal state
through every step makes the final counter depend on every step's
embeddings, so one final scalar fetch forces the whole chain.  To cancel
the constant round-trip/fetch overhead (~25-65 ms, variable), we time the
chain at two iteration counts and report the SLOPE:

    per_step = (t(n_hi) - t(n_lo)) / (n_hi - n_lo)

Validated against a known quantity: the same pattern times 8192^3 bf16
matmuls at 5.9 ms/step = 186 TFLOPS on a ~197 TFLOPS v5e (94% of peak,
physically sane and reproducible across trials).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _chain_time(det, frames, n_steps, batch):
    """Wall time of n_steps chained detector+temporal steps, forced by one
    scalar fetch of the final temporal counter (which data-depends on every
    step's embeddings)."""
    import jax.numpy as jnp

    from truely_tpu.ops.temporal import init_temporal_state

    state = init_temporal_state(512)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = det.step_device(frames)
        res = det._temporal(out.embedding, out.has_face, jnp.int32(batch), state)
        state = res.state
    int(state.counter)  # scalar fetch: forces the whole chain
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from truely_tpu.config import DetectorConfig
    from truely_tpu.pipeline.detector import Detector

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # batch 128 is the measured throughput knee at 1080p (b64 536 /
        # b96 628 / b128 639 sampled fps): XLA lays activations out with
        # batch in the 128-lane minor dim, so b64 pads half the lanes.
        height, width, batch = 1080, 1920, 128
        n_lo, n_hi = 2, 7
        if "--batch" in sys.argv:
            batch = int(sys.argv[sys.argv.index("--batch") + 1])
        if "--res" in sys.argv:  # e.g. --res 720x1280 (default 1080x1920)
            height, width = map(
                int, sys.argv[sys.argv.index("--res") + 1].split("x")
            )
    else:  # keep the script runnable anywhere (CI, dev boxes)
        height, width, batch = 216, 384, 4
        n_lo, n_hi = 1, 3

    fps_video = 30
    quant = 4
    if "--crop-quant" in sys.argv:  # stage-crop box grid (1 = exact)
        quant = int(sys.argv[sys.argv.index("--crop-quant") + 1])
    from truely_tpu.config import MTCNNConfig

    config = DetectorConfig(
        frame_batch=batch, mtcnn=MTCNNConfig(stage_crop_quant=quant)
    )
    det = Detector(config)
    interval = config.sample_interval(fps_video)  # 4 at 30 fps

    rng = np.random.default_rng(0)
    frames_host = rng.integers(0, 256, (batch, height, width, 3), dtype=np.uint8)
    frames = jax.device_put(jnp.asarray(frames_host))

    # Warmup / compile (both executables + the scalar-fetch path).
    _chain_time(det, frames, 1, batch)
    _chain_time(det, frames, 1, batch)

    # Best of 3 trials (shared remote service => take the quietest run).
    per_step = min(
        (_chain_time(det, frames, n_hi, batch)
         - _chain_time(det, frames, n_lo, batch)) / (n_hi - n_lo)
        for _ in range(3)
    )

    sampled_fps = batch / per_step
    video_fps = sampled_fps * interval
    baseline = 900.0  # north-star frames/sec/chip, defined AT 1080p
    # The 900 fps target is a 1080p number; normalizing other buckets by
    # it would be apples-to-oranges, so --res runs report null.
    vs = (
        round(video_fps / baseline, 4)
        if (height, width) == (1080, 1920) or not on_tpu
        else None
    )
    print(
        json.dumps(
            {
                "metric": f"video_frames_per_sec_per_chip_{height}p",
                "value": round(video_fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": vs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
