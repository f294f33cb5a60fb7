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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from truely_tpu.config import DetectorConfig
    from truely_tpu.ops.temporal import init_temporal_state
    from truely_tpu.pipeline.detector import Detector

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        height, width, batch, iters = 1080, 1920, 64, 5
    else:  # keep the script runnable anywhere (CI, dev boxes)
        height, width, batch, iters = 216, 384, 4, 2

    fps_video = 30
    config = DetectorConfig(frame_batch=batch)
    det = Detector(config)
    interval = config.sample_interval(fps_video)  # 4 at 30 fps

    rng = np.random.default_rng(0)
    frames_host = rng.integers(0, 256, (batch, height, width, 3), dtype=np.uint8)
    frames = jax.device_put(jnp.asarray(frames_host))
    state = init_temporal_state(512)

    def one_step(state):
        out = det.step_device(frames)
        res = det._temporal(out.embedding, out.has_face, jnp.int32(batch), state)
        return out, res

    # Warmup / compile.
    out, res = one_step(state)
    jax.block_until_ready((out, res))
    out, res = one_step(res.state)
    jax.block_until_ready((out, res))

    t0 = time.perf_counter()
    st = res.state
    for _ in range(iters):
        out, res = one_step(st)
        st = res.state
    jax.block_until_ready((out, res))
    dt = time.perf_counter() - t0

    sampled_fps = batch * iters / dt
    video_fps = sampled_fps * interval
    baseline = 900.0  # north-star frames/sec/chip
    print(
        json.dumps(
            {
                "metric": "video_frames_per_sec_per_chip_1080p",
                "value": round(video_fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(video_fps / baseline, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
