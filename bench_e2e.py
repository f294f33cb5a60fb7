#!/usr/bin/env python3
"""End-to-end benchmark against the north star: a 60 s 1080p30 video
(1800 frames) analyzed in < 2 s wall-clock on one chip (BASELINE.md).

Unlike bench.py (device-resident sampled-frame throughput), this measures
the WHOLE product path the north star talks about: file -> cv2 decode ->
H2D upload -> cascade+embed+temporal on device -> score (and optionally
the annotated output video).  Wall-clock is an honest end-to-end number:
the final score is a host int, so nothing can hide in async dispatch.

A synthetic 60 s 1080p30 clip (moving gradient + blocks; encodes fast and
realistically under mp4v) is generated once and cached.

Prints ONE JSON line per configuration with wall seconds, video fps, and
the decode/device/encode breakdown from VideoAnalysis.timings.
"""

import json
import os
import sys
import time

import numpy as np

CACHE_DIR = os.path.expanduser("~/.cache/truely_tpu_bench")
CLIP = os.path.join(CACHE_DIR, "synthetic_60s_1080p30.mp4")
FPS = 30
SECONDS = 60
H, W = 1080, 1920


def make_clip() -> str:
    """Synthesize and cache the 60 s 1080p30 test clip."""
    import cv2

    if os.path.exists(CLIP) and os.path.getsize(CLIP) > 0:
        return CLIP
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = CLIP + ".tmp.mp4"
    writer = cv2.VideoWriter(
        tmp, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H)
    )
    yy, xx = np.mgrid[0:H, 0:W]
    base = ((xx * 255 // W).astype(np.uint8), (yy * 255 // H).astype(np.uint8))
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 200, (8, 4))  # x, y, w-ish seeds
    frame = np.zeros((H, W, 3), np.uint8)
    for t in range(FPS * SECONDS):
        frame[..., 0] = base[0]
        frame[..., 1] = base[1]
        frame[..., 2] = (t * 4) % 256
        # a few moving blocks so the encoder/detector see structure
        for bi, (bx, by, bw, bh) in enumerate(blocks):
            x = int((bx * 7 + t * (3 + bi)) % (W - 200))
            y = int((by * 5 + t * (2 + bi)) % (H - 200))
            frame[y:y + 100 + bh, x:x + 100 + bw] = (bi * 37) % 255
        writer.write(frame)
    writer.release()
    os.replace(tmp, CLIP)
    return CLIP


def run_once(det, clip, output_path=None):
    t0 = time.perf_counter()
    res = det.analyze_video(clip, output_path)
    wall = time.perf_counter() - t0
    return wall, res


def main():
    from truely_tpu.config import DetectorConfig
    from truely_tpu.pipeline.detector import Detector

    annotate = "--annotate" in sys.argv
    no_yuv = "--no-yuv" in sys.argv
    clip = make_clip()
    det = Detector(DetectorConfig(frame_batch=64, yuv_ingest=not no_yuv))
    det.warmup(H, W)

    out = os.path.join(CACHE_DIR, "annotated.mp4") if annotate else None
    run_once(det, clip, out)  # warm (decode cache, jits, temporal shapes)
    wall, res = run_once(det, clip, out)

    n_frames = FPS * SECONDS
    sampled = res.total_processed
    # bytes/px actually uploaded: packed I420 is 1.5, BGR is 3
    yuv_used = res.yuv_ingest
    upload_mb = sampled * H * W * (1.5 if yuv_used else 3) / 1e6
    result = {
        "metric": "e2e_wall_seconds_60s_1080p30" + ("_annotated" if annotate else ""),
        "value": round(wall, 3),
        "unit": "seconds",
        "vs_baseline": round(2.0 / wall, 4),  # north star: < 2 s
        "video_fps": round(n_frames / wall, 1),
        "fake_score": res.fake_score,
        "yuv_ingest": yuv_used,
        "upload_mb": round(upload_mb, 1),
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
