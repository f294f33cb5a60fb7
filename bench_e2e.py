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

``--model-host`` additionally turns the "<2 s on a production host" claim
into auditable arithmetic: it slope-measures the pure chip time of the
exact step analyze_video just ran (forced execution, see bench.py), then
recomputes each stage's wall under parameterized host assumptions —
``--h2d-gbps`` (PCIe H2D bandwidth; this rig's tunnel is ~0.05),
``--decode-cores`` / ``--encode-cores`` (this rig has ONE core) — and
prints measured-rig vs modeled columns per stage with the formula used.
The pipeline overlaps decode, H2D, compute, and encode (decode thread +
2-deep uploads + encode worker), so the modeled wall is
``max(stage walls) + one pipeline-fill step``.
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


def _arg(flag, default, cast):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def _chip_seconds_per_step(det, batch):
    """Pure chip time of one frame step, forced-execution slope (bench.py
    methodology: chain the temporal state through every step so one final
    scalar fetch forces the whole chain; the slope between two chain
    lengths cancels the constant round-trip overhead).  Uses the EXACT
    step executable analyze_video just ran (same batch, same bucket, same
    ingestion), so the compile is already cached in-process."""
    import jax
    import jax.numpy as jnp

    from truely_tpu.ops.temporal import init_temporal_state

    rng = np.random.default_rng(0)
    if det.config.yuv_ingest:
        host = rng.integers(0, 256, (batch, H * 3 // 2, W), dtype=np.uint8)
        step = det._ensure_yuv_step()
        run = lambda f: step(det.params, f)  # noqa: E731
    else:
        host = rng.integers(0, 256, (batch, H, W, 3), dtype=np.uint8)
        run = det.step_device
    frames = jax.device_put(jnp.asarray(host))

    def chain(n):
        state = init_temporal_state(512)
        t0 = time.perf_counter()
        for _ in range(n):
            out = run(frames)
            state = det._temporal(
                out.embedding, out.has_face, jnp.int32(batch), state
            ).state
        int(state.counter)  # scalar fetch forces the whole chain
        return time.perf_counter() - t0

    chain(1)
    chain(1)
    return min((chain(7) - chain(2)) / 5 for _ in range(3))


def _model_host(det, res, wall, annotate, upload_gb):
    """Recompute each stage's wall under parameterized host assumptions so
    the "<2 s on a production host" projection is arithmetic, not prose.

    Host knobs (defaults are a plain PCIe v5e host; this rig for contrast
    is a 1-core box behind a ~0.05 GB/s tunnel):
      --h2d-gbps N       host->device bandwidth, GB/s        [16]
      --decode-cores N   cores decoding (frame-threaded)      [8]
      --encode-cores N   cores for x264 (threads scale ~lin)  [8]

    Per-stage model (each stage is overlapped by the real pipeline —
    decode thread, 2-deep H2D, encode worker — so modeled wall is
    max(stage walls) + one pipeline-fill step):
      decode' = decode_rig * rig_cores(1) / decode_cores
      h2d'    = uploaded_bytes / h2d_gbps
      chip'   = measured on this chip (forced-execution slope)
      encode' = encode_rig * rig_cores(1) / encode_cores
    """
    import jax

    h2d_gbps = _arg("--h2d-gbps", 16.0, float)
    decode_cores = _arg("--decode-cores", 8, int)
    encode_cores = _arg("--encode-cores", 8, int)

    t = res.timings
    batch = det.config.frame_batch
    n_steps = max(1, -(-res.total_processed // batch))
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        chip_s = _chip_seconds_per_step(det, batch) * n_steps
    else:  # keep runnable on CPU: the rig device bucket is the best bound
        chip_s = t["device"]

    # Pure decode pass (no device loop competing for the core): the
    # honest 1-core decode figure the per-core model scales from.  The
    # in-run timings["decode"] is inflated on this 1-core rig by
    # timesharing with the main thread's device fetch waits.
    from truely_tpu.media.decode import VideoReader

    reader = VideoReader(CLIP, rgb=not det.config.reference_compat,
                         yuv=det.config.yuv_ingest)
    interval = det.config.sample_interval(reader.meta.fps)
    td0 = time.perf_counter()
    it = (reader.yuv_frames(interval) if reader.yuv_active
          else reader.frames())
    for _ in it:
        pass
    decode_pure_s = time.perf_counter() - td0
    reader.close()

    stages = {
        "decode": {
            "rig_s": round(decode_pure_s, 3),
            "rig_inrun_s": round(t["decode"], 3),
            "modeled_s": round(decode_pure_s / decode_cores, 3),
            "formula": f"{decode_pure_s:.2f}s pure-decode pass x 1 rig "
                       f"core / {decode_cores} cores (in-run figure "
                       f"{t['decode']:.2f}s timeshares the core with the "
                       "device loop)",
        },
        "h2d": {
            # the rig's H2D is inside the "device" bucket (tunnel waits +
            # round trips); its share is device_bucket - pure chip time
            "rig_s": round(max(t["device"] - chip_s, 0.0), 3),
            "gb": round(upload_gb, 3),
            "modeled_s": round(upload_gb / h2d_gbps, 3),
            "formula": f"{upload_gb:.2f} GB / {h2d_gbps:g} GB/s",
        },
        "chip": {
            "rig_s": round(chip_s, 3),
            "modeled_s": round(chip_s, 3),
            "formula": "measured, forced-execution slope x "
                       f"{n_steps} steps (bench.py methodology)"
                       + ("" if on_tpu else " [CPU fallback: rig device bucket]"),
        },
    }
    if annotate:
        stages["encode"] = {
            "rig_s": round(t["encode"], 3),
            "modeled_s": round(t["encode"] / encode_cores, 3),
            "formula": f"{t['encode']:.2f}s x 1 rig core / {encode_cores} cores",
        }
    fill_s = sum(s["modeled_s"] for s in stages.values()) / n_steps
    modeled_wall = max(s["modeled_s"] for s in stages.values()) + fill_s
    print(json.dumps({
        "metric": "e2e_modeled_host_wall_seconds_60s_1080p30"
                  + ("_annotated" if annotate else ""),
        "value": round(modeled_wall, 3),
        "unit": "seconds",
        "vs_baseline": round(2.0 / modeled_wall, 4),  # north star: < 2 s
        "rig_wall_s": round(wall, 3),
        "host_assumptions": {
            "h2d_gbps": h2d_gbps,
            "decode_cores": decode_cores,
            "encode_cores": encode_cores,
        },
        "wall_formula": "max(stage modeled_s) + pipeline fill "
                        f"(sum(modeled_s)/{n_steps} steps = {fill_s:.3f}s)",
        "stages": stages,
    }))


def main():
    from truely_tpu.config import DetectorConfig
    from truely_tpu.pipeline.detector import Detector

    annotate = "--annotate" in sys.argv
    no_yuv = "--no-yuv" in sys.argv
    batch = _arg("--batch", 64, int)  # 128 = the measured throughput knee
    clip = make_clip()
    det = Detector(DetectorConfig(frame_batch=batch, yuv_ingest=not no_yuv))
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
    if "--model-host" in sys.argv:
        _model_host(det, res, wall, annotate, upload_mb / 1e3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
