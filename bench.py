#!/usr/bin/env python3
"""Headline benchmark: sampled-frame throughput of the full device pipeline
(MTCNN cascade + face crop + FaceNet embed + temporal fold) on one chip.

North star (BASELINE.json): a 60 s 1080p30 video (1800 frames) analyzed in
< 2 s wall-clock on one v5e chip => >= 900 frames/sec/chip; at the
reference's ~7 Hz sampling (every 4th frame at 30 fps) that is 225 sampled
(fully processed) frames/sec.  We report *video* frames/sec/chip — sampled
throughput x sample interval — so the number is directly comparable to the
north star; vs_baseline = value / 900.

A default run prints one JSON line per tracked config — the 360p and 720p
production buckets, the EXACT parity chain at 1080p (`--exact-pyramid
--crop-quant 1`: the operator chain every decision-parity proof pins, see
tests/test_full_pipeline_oracle.py), and LAST the production-default 1080p
headline (the line the driver parses).  Passing any of --res/--batch/
--crop-quant/--exact-pyramid runs that single config instead.

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
"""

import json
import sys
import time

import numpy as np

# v5e single-chip peaks (public spec: 197 TFLOPS bf16, 819 GB/s HBM) —
# the denominators for the MFU / HBM-utilization fields.  The step-FLOP
# and HBM-byte numerators come from XLA's own cost model over the exact
# compiled executable (compiled.cost_analysis()), not hand arithmetic.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


def _cost_analysis(jitted, *args):
    """(flops, hbm_bytes) from XLA's cost model for jitted(*args); None
    on runtimes whose PJRT plugin doesn't expose it."""
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        return (flops, nbytes) if flops > 0 else None
    except Exception:
        return None


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


def _chain_time_propagate(det, frames, n_steps, batch, k):
    """Wall time of n_steps chained track-propagated steps at
    detect_interval=k: every k-th iteration re-runs the full cascade on a
    keyframe batch (1 seed step serves k refine segments, exactly the
    production cadence when n_steps is a multiple of k), every iteration
    runs the seeded refine step, and the temporal chain forces execution."""
    import jax.numpy as jnp

    from truely_tpu.ops.temporal import init_temporal_state

    refine = det._ensure_propagate_step(False)
    detect = det._ensure_detect_step(False)  # cascade-only keyframe seeds
    bk = batch // k
    state = init_temporal_state(512)
    seed_box = seed_hf = None
    t0 = time.perf_counter()
    for i in range(n_steps):
        if i % k == 0:
            seed_box, seed_hf = detect(det.params, frames)
        out = refine(det.params, frames, seed_box[:bk], seed_hf[:bk])
        res = det._temporal(out.embedding, out.has_face, jnp.int32(batch), state)
        state = res.state
    int(state.counter)  # scalar fetch: forces the whole chain
    return time.perf_counter() - t0


def _measure(height, width, batch, quant, exact_pyramid, n_lo, n_hi,
             yuv=False, detect_interval=1):
    """Video frames/sec/chip for one config (slope-timed, best of 3).
    ``yuv=True`` feeds packed I420 through the production-ingestion step
    (on-device exact colorspace conversion included in the timing).
    ``detect_interval=k>1`` measures track-propagated mode (full cascade
    amortized over k segments + per-segment refine)."""
    import jax
    import jax.numpy as jnp

    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    fps_video = 30
    config = DetectorConfig(
        frame_batch=batch,
        detect_interval=detect_interval,
        mtcnn=MTCNNConfig(
            stage_crop_quant=quant, pyramid_cascade=not exact_pyramid
        ),
    )
    det = Detector(config)
    interval = config.sample_interval(fps_video)  # 4 at 30 fps

    rng = np.random.default_rng(0)
    if yuv:
        frames_host = rng.integers(
            0, 256, (batch, height * 3 // 2, width), dtype=np.uint8
        )
        det.step_device = lambda f, _s=det._ensure_yuv_step(): _s(det.params, f)  # noqa: E501
    else:
        frames_host = rng.integers(
            0, 256, (batch, height, width, 3), dtype=np.uint8
        )
    frames = jax.device_put(jnp.asarray(frames_host))

    if detect_interval > 1:
        k = detect_interval
        n_lo, n_hi = k, 3 * k  # multiples of k => exact 1-seed-per-k cadence
        _chain_time_propagate(det, frames, k, batch, k)
        _chain_time_propagate(det, frames, k, batch, k)
        per_step = min(
            (_chain_time_propagate(det, frames, n_hi, batch, k)
             - _chain_time_propagate(det, frames, n_lo, batch, k))
            / (n_hi - n_lo)
            for _ in range(3)
        )
        # Blended cost per iteration: every iteration runs the refine
        # step; every k-th also runs the cascade-only keyframe seed step.
        bk = batch // k
        refine = det._ensure_propagate_step(False)
        cost_f = _cost_analysis(
            det._ensure_detect_step(False), det.params, frames
        )
        cost_r = _cost_analysis(
            refine, det.params, frames,
            jnp.zeros((bk, 4), jnp.float32), jnp.zeros((bk,), bool),
        )
        cost = None
        if cost_f and cost_r:
            cost = (cost_r[0] + cost_f[0] / k, cost_r[1] + cost_f[1] / k)
        return batch / per_step * interval, per_step, cost

    # Warmup / compile (both executables + the scalar-fetch path).
    _chain_time(det, frames, 1, batch)
    _chain_time(det, frames, 1, batch)

    # Best of 3 trials (shared remote service => take the quietest run).
    per_step = min(
        (_chain_time(det, frames, n_hi, batch)
         - _chain_time(det, frames, n_lo, batch)) / (n_hi - n_lo)
        for _ in range(3)
    )
    step = det._ensure_yuv_step() if yuv else det._step
    cost = _cost_analysis(step, det.params, frames)
    return batch / per_step * interval, per_step, cost


def _emit(name, video_fps, *, baseline=None, per_step=None, cost=None):
    vs = round(video_fps / baseline, 4) if baseline else None
    payload = {
        "metric": f"video_frames_per_sec_per_chip_{name}",
        "value": round(video_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": vs,
    }
    if per_step and cost:
        flops, nbytes = cost
        # MFU vs bf16 peak and HBM-bandwidth utilization of the measured
        # step — the roofline position: whichever fraction is higher is
        # the resource the step is actually bound by.
        payload["mfu"] = round(flops / per_step / PEAK_BF16_FLOPS, 4)
        payload["hbm_util"] = round(nbytes / per_step / PEAK_HBM_BYTES, 4)
        payload["step_gflops"] = round(flops / 1e9, 1)
        payload["step_hbm_gb"] = round(nbytes / 1e9, 3)
    print(json.dumps(payload), flush=True)


def _bucket_targets():
    """Per-bucket video-fps targets from BASELINE.json (north-star law:
    >= 900 video fps/chip at every resolution bucket), so every emitted
    line has a pass/fail vs_baseline instead of null."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    targets = {"360p": 900.0, "720p": 900.0, "1080p": 900.0}
    try:
        with open(path) as f:
            raw = json.load(f).get("bucket_targets", {})
        targets.update(
            {k: float(v) for k, v in raw.items() if k != "note"}
        )
    except Exception:
        pass
    return targets


def main():
    import jax

    on_tpu = jax.default_backend() not in ("cpu",)
    targets = _bucket_targets()
    baseline = targets["1080p"]  # north-star frames/sec/chip at 1080p

    explicit = any(
        f in sys.argv for f in ("--res", "--batch", "--crop-quant",
                                "--exact-pyramid", "--detect-interval")
    )
    if not on_tpu:  # keep the script runnable anywhere (CI, dev boxes)
        fps, per_step, cost = _measure(216, 384, 4, 4, False, 1, 3)
        # vs the 1080p law: CPU-only
        _emit("216p", fps, baseline=baseline, per_step=per_step, cost=cost)
        return 0

    # batch 128 is the measured throughput knee at 1080p (b64 536 /
    # b96 628 / b128 639 sampled fps): XLA lays activations out with
    # batch in the 128-lane minor dim, so b64 pads half the lanes.
    if explicit:
        height, width, batch, quant = 1080, 1920, 128, 4
        if "--batch" in sys.argv:
            batch = int(sys.argv[sys.argv.index("--batch") + 1])
        if "--res" in sys.argv:  # e.g. --res 720x1280
            height, width = map(
                int, sys.argv[sys.argv.index("--res") + 1].split("x")
            )
        if "--crop-quant" in sys.argv:  # stage-crop box grid (1 = exact)
            quant = int(sys.argv[sys.argv.index("--crop-quant") + 1])
        k = 1
        if "--detect-interval" in sys.argv:  # track-propagated mode
            k = int(sys.argv[sys.argv.index("--detect-interval") + 1])
        exact = "--exact-pyramid" in sys.argv
        fps, per_step, cost = _measure(height, width, batch, quant, exact,
                                       2, 7, detect_interval=k)
        name = f"{height}p" + ("_exact" if (exact and quant == 1) else "")
        if k > 1:
            name += f"_propagate_k{k}"
        _emit(name, fps, baseline=targets.get(f"{height}p", baseline),
              per_step=per_step, cost=cost)
        return 0

    # Default sweep: secondary lines first, the production-1080p headline
    # LAST (the driver parses the final JSON line).  Every bucket has a
    # target (BASELINE.json bucket_targets, north-star law), so every line
    # is a pass/fail.
    for name, h, w, quant, exact, yuv, k in (
        ("360p", 360, 640, 4, False, False, 1),
        ("720p", 720, 1280, 4, False, False, 1),
        ("1080p_exact", 1080, 1920, 1, True, False, 1),
        ("1080p_yuv_ingest", 1080, 1920, 4, False, True, 1),
        ("1080p_propagate_k4", 1080, 1920, 4, False, False, 4),
    ):
        try:
            fps, per_step, cost = _measure(h, w, 128, quant, exact, 2, 7,
                                           yuv=yuv, detect_interval=k)
            _emit(name, fps, baseline=targets.get(f"{h}p", baseline),
                  per_step=per_step, cost=cost)
        except Exception as e:  # a secondary config must not eat the headline
            print(f"bench config {name} failed: {e}", file=sys.stderr)
    fps, per_step, cost = _measure(1080, 1920, 128, 4, False, 2, 7)
    _emit("1080p", fps, baseline=baseline, per_step=per_step, cost=cost)
    return 0


if __name__ == "__main__":
    sys.exit(main())
