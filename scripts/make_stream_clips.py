#!/usr/bin/env python3
"""Synthesize N distinct clips for the BASELINE config-5 streaming demo
(8 concurrent 1080p60 streams — SURVEY.md §7; the reference handles one
upload at a time in a blocking loop, reference server/server.py:611).

Each clip gets its own seed (different block trajectories and phase), so
the 8 "live feeds" are genuinely distinct content, not 8 copies of one
file.  mp4v via cv2 — the only encoder this rig's cv2 bundles; the demo
measures the scheduler + device path, not the synthetic encode.

Usage: python scripts/make_stream_clips.py [--n 8] [--fps 60]
       [--seconds 20] [--height 1080] [--width 1920]
Prints one path per line (cached: existing non-empty files are kept).
"""

import argparse
import os

import numpy as np

CACHE_DIR = os.path.expanduser("~/.cache/truely_tpu_bench/streams")


def make_clip(path, seed, fps, seconds, h, w):
    import cv2

    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    tmp = path + ".tmp.mp4"
    writer = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise IOError(f"cv2 VideoWriter failed for {path}")
    yy, xx = np.mgrid[0:h, 0:w]
    base_b = (xx * 255 // w).astype(np.uint8)
    base_g = (yy * 255 // h).astype(np.uint8)
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 200, (8, 4))
    phase = int(rng.integers(0, 256))
    frame = np.zeros((h, w, 3), np.uint8)
    for t in range(fps * seconds):
        frame[..., 0] = base_b
        frame[..., 1] = base_g
        frame[..., 2] = (phase + t * 4) % 256
        for bi, (bx, by, bw, bh) in enumerate(blocks):
            x = int((bx * 7 + t * (3 + bi)) % (w - 200))
            y = int((by * 5 + t * (2 + bi)) % (h - 200))
            frame[y:y + 100 + bh, x:x + 100 + bw] = (seed * 29 + bi * 37) % 255
        writer.write(frame)
    writer.release()
    os.replace(tmp, path)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--fps", type=int, default=60)
    ap.add_argument("--seconds", type=int, default=20)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    os.makedirs(CACHE_DIR, exist_ok=True)
    for i in range(args.n):
        name = (f"stream{i}_{args.height}p{args.fps}_"
                f"{args.seconds}s.mp4")
        print(make_clip(os.path.join(CACHE_DIR, name), seed=i + 1,
                        fps=args.fps, seconds=args.seconds,
                        h=args.height, w=args.width), flush=True)


if __name__ == "__main__":
    main()
