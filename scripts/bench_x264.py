#!/usr/bin/env python3
"""x264 encoder ladder for the annotated-output path (VERDICT r4 task 4).

The annotated re-encode is the binding stage of the modeled production
host (PERFORMANCE.md "Modeled production host"): every output frame is
re-encoded regardless of drawing (reference contract draws on every
sampled frame with a face, server/model.py:67-77).  Round 4 declared it
encoder-bound after measuring ultrafast only; this script measures the
actual ladder on the 60 s 1080p30 synthetic clip's frames:

- preset x crf x threads x slices over the native writer
  (native/videoenc.cpp; knobs added for this measurement),
- the I420 plane-copy input path (write_i420 — what untouched frames use)
  vs the BGR+swscale path (what drawn frames use),
- a draw-fraction sweep modeling draw_mode="flagged-only" (clean frames
  skip i420→BGR→draw→swscale; x264 still encodes every frame).

Per config it reports wall seconds, PROCESS CPU seconds (sums all x264
worker threads, so a 1-core rig still measures the true per-core cost),
output bytes, and the modeled 8-core wall for the full 1800-frame clip:
cpu_s * (1800 / frames) / 8 under x264 frame-threading (the documented
assumption; x264's frame-parallel scaling is near-linear at 8 threads for
1080p).  Host-only — runs anywhere, no TPU needed.

Usage: python scripts/bench_x264.py [--frames 300] [--full]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_frames(n):
    """First n frames of the cached synthetic clip as (BGR, packed I420)."""
    import cv2

    from bench_e2e import make_clip

    clip = make_clip()
    cap = cv2.VideoCapture(clip)
    bgr = []
    while len(bgr) < n:
        ok, f = cap.read()
        if not ok:
            break
        bgr.append(f)
    cap.release()
    bgr = np.stack(bgr)
    packed = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in bgr]
    )
    return bgr, packed


def encode_run(path, frames_bgr, frames_i420, draw_fraction, *,
               preset, crf, threads, slices, fps=30):
    """Encode len(frames) frames; a draw_fraction share go through the
    BGR+swscale path (as drawn frames do), the rest through the I420
    plane copy.  Returns (wall_s, cpu_s, bytes)."""
    from truely_tpu.media.encode import VideoWriter

    n = frames_bgr.shape[0]
    h, w = frames_bgr.shape[1], frames_bgr.shape[2]
    drawn_every = int(round(1.0 / draw_fraction)) if draw_fraction > 0 else 0
    writer = VideoWriter(path, fps, w, h, preset=preset, crf=crf,
                         threads=threads, slices=slices)
    assert writer.codec == "h264", "native x264 writer required"
    t0, c0 = time.perf_counter(), time.process_time()
    for i in range(n):
        if drawn_every and i % drawn_every == 0:
            writer.write(frames_bgr[i])
        else:
            writer.write_i420(frames_i420[i])
    writer.close()
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    return wall, cpu, os.path.getsize(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300,
                    help="frames per config (wall scales linearly; 300 = "
                         "10 s of the clip)")
    ap.add_argument("--full", action="store_true",
                    help="run the full grid (default: the decision subset)")
    ap.add_argument("--out", default="/tmp/bench_x264")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    bgr, packed = load_frames(args.frames)
    n = bgr.shape[0]
    total_frames = 1800  # the north-star clip

    # draw_fraction=1.0 == the reference "all" contract; 0.1 models
    # flagged-only on mostly-clean content; 0.0 is the pure passthrough
    # floor (still x264-encoding every frame).
    grid = [
        # (label, preset, crf, threads, slices, draw_fraction)
        ("ultrafast_crf23_all", "ultrafast", 23, 0, 0, 1.0),
        ("ultrafast_crf23_flagged10", "ultrafast", 23, 0, 0, 0.1),
        ("ultrafast_crf23_clean", "ultrafast", 23, 0, 0, 0.0),
        ("superfast_crf23_all", "superfast", 23, 0, 0, 1.0),
        ("veryfast_crf23_all", "veryfast", 23, 0, 0, 1.0),
        ("ultrafast_crf28_all", "ultrafast", 28, 0, 0, 1.0),
        ("ultrafast_crf18_all", "ultrafast", 18, 0, 0, 1.0),
        ("ultrafast_crf23_sliced8_all", "ultrafast", 23, 8, 8, 1.0),
        ("ultrafast_crf23_threads8_all", "ultrafast", 23, 8, 0, 1.0),
    ]
    if args.full:
        for preset in ("faster", "fast", "medium"):
            grid.append((f"{preset}_crf23_all", preset, 23, 0, 0, 1.0))

    results = []
    for label, preset, crf, threads, slices, frac in grid:
        path = os.path.join(args.out, f"{label}.mp4")
        wall, cpu, size = encode_run(
            path, bgr, packed, frac,
            preset=preset, crf=crf, threads=threads, slices=slices,
        )
        row = {
            "config": label,
            "frames": n,
            "wall_s": round(wall, 3),
            "cpu_s": round(cpu, 3),
            "cpu_ms_per_frame": round(cpu / n * 1000, 2),
            "mbytes": round(size / 1e6, 2),
            "modeled_8core_wall_s_1800f": round(
                cpu * (total_frames / n) / 8, 3
            ),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
