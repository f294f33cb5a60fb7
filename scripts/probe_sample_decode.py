#!/usr/bin/env python3
"""Sample-only decode probe (VERDICT r4 task 6).

At the 7 Hz law on 1080p60 (interval 8), 7 of 8 decoded frames are
discarded host-side, yet the decode stage of the config-5 modeled-host
table charges for full decode of every frame.  Two levers:

1. ``videodec.skip`` (EXACT, now the default on the score path): decode
   without exporting planes — inter-frame refs force the decode itself,
   but the ~3.1 MB/frame plane copy + buffer churn is skipped for
   unsampled frames.
2. ``videodec.open(path, skip_nonref=1)`` (APPROXIMATE, probe-only):
   AVDISCARD_NONREF drops non-reference frames inside the decoder —
   several-fold cheaper on B-frame content, but delivered frames are no
   longer every coded frame, so the product sampling law can't use it
   without changing decisions.  Its win is content-dependent: zero on
   no-B-frame encodes (the bundled fixture, cv2's mp4v), large on
   typical social-platform H.264 (bframes=3).

This probe measures both on a B-frame-bearing 1080p60 H.264 clip encoded
by our own native x264 writer (preset veryfast => bframes=3), plus the
no-skip baseline, and prints decode fps/core and the implied decode-core
requirement for BASELINE config 5 (8 x 1080p60 feeds).  Host-only.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, FPS, SECONDS = 1080, 1920, 60, 10
CLIP = "/tmp/probe_sample_decode_1080p60.mp4"


def make_bframe_clip():
    from truely_tpu.media.encode import VideoWriter

    if os.path.exists(CLIP) and os.path.getsize(CLIP) > 0:
        return
    yy, xx = np.mgrid[0:H, 0:W]
    base0 = (xx * 255 // W).astype(np.uint8)
    base1 = (yy * 255 // H).astype(np.uint8)
    frame = np.zeros((H, W, 3), np.uint8)
    # veryfast: x264 defaults bframes=3 -> real NONREF-droppable frames.
    with VideoWriter(CLIP, FPS, W, H, preset="veryfast", crf=23) as wr:
        assert wr.codec == "h264"
        for t in range(FPS * SECONDS):
            frame[..., 0] = base0
            frame[..., 1] = base1
            frame[..., 2] = (t * 4) % 256
            x = (t * 9) % (W - 220)
            y = (t * 5) % (H - 220)
            frame[y:y + 200, x:x + 200] = 230
            wr.write(frame)


def run_mode(label, interval, *, use_skip, skip_nonref):
    from truely_tpu.media import videodec

    hnd, w, h, fn, fd, nb = videodec.open(CLIP, 1 if skip_nonref else 0)
    buf = np.empty((h * 3 // 2, w), np.uint8)
    n_delivered = n_exported = 0
    t0, c0 = time.perf_counter(), time.process_time()
    while True:
        if n_delivered % interval == 0:
            if not videodec.read(hnd, buf):
                break
            n_exported += 1
        elif use_skip:
            if not videodec.skip(hnd):
                break
        else:
            if not videodec.read(hnd, buf):
                break
            n_exported += 1
        n_delivered += 1
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    videodec.close(hnd)
    coded = FPS * SECONDS
    # config 5: 8 feeds x 60 coded fps = 480 coded frames/s to keep up
    # (NONREF mode only decodes the delivered share of those).
    decode_share = n_delivered / coded
    fps_wall = n_delivered / wall if wall else 0.0
    need_cores = (480.0 * decode_share) / (n_delivered / cpu) if cpu else 0.0
    row = {
        "mode": label,
        "interval": interval,
        "coded_frames": coded,
        "delivered_frames": n_delivered,
        "exported_frames": n_exported,
        "wall_s": round(wall, 3),
        "cpu_s": round(cpu, 3),
        "decode_fps_wall": round(fps_wall, 1),
        "decode_fps_per_cpu_core": round(n_delivered / cpu, 1) if cpu else 0,
        "config5_decode_cores_needed": round(need_cores, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    make_bframe_clip()
    run_mode("full_read_all(baseline)", 8, use_skip=False, skip_nonref=False)
    run_mode("skip_unsampled(exact,default)", 8, use_skip=True,
             skip_nonref=False)
    run_mode("nonref_discard(approx,probe)", 8, use_skip=True,
             skip_nonref=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
