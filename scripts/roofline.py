#!/usr/bin/env python3
"""Per-stage roofline accounting for the production frame step (VERDICT r4
task 5's second half).

bench.py now reports whole-step MFU / HBM utilization from XLA's cost
model; this script breaks the same accounting down per stage — pyramid +
P-Net stage 1, the R-Net/O-Net stage crops + heads, and the FaceNet +
landmark embed tail — by jitting each stage separately and asking the
compiler (compiled.cost_analysis()) for its FLOPs and bytes.  Each stage
prints its arithmetic intensity, the FLOP-bound and bandwidth-bound time
floors at v5e peaks (197 TFLOPS bf16, 819 GB/s HBM), and — when a
measured ms is supplied from the PERFORMANCE.md trace-attribution table —
its achieved fraction of the binding roofline.

Caveat stated where it matters: stage-sliced jits lose cross-stage fusion,
so the per-stage sums exceed the fused whole-step numbers slightly; the
whole-step row (the same jit bench.py times) is the ground truth and is
printed alongside.

Run on TPU: timeout 560 python scripts/roofline.py [--batch 128]
            [--res 1080x1920] [--measured-ms stage1=54,crops=25,embed=7]
"""

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


def cost(jitted, *args):
    comp = jitted.lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def row(name, flops, nbytes, measured_ms=None):
    ai = flops / nbytes if nbytes else float("inf")
    t_flop_ms = flops / PEAK_BF16_FLOPS * 1e3
    t_hbm_ms = nbytes / PEAK_HBM_BYTES * 1e3
    bound = "compute" if t_flop_ms >= t_hbm_ms else "bandwidth"
    out = {
        "stage": name,
        "gflops": round(flops / 1e9, 1),
        "hbm_gb": round(nbytes / 1e9, 3),
        "arith_intensity": round(ai, 1),
        "floor_ms_compute": round(t_flop_ms, 2),
        "floor_ms_bandwidth": round(t_hbm_ms, 2),
        "bound": bound,
    }
    if measured_ms:
        floor = max(t_flop_ms, t_hbm_ms)
        out["measured_ms"] = measured_ms
        out["roofline_fraction"] = round(floor / measured_ms, 3)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--res", default="1080x1920")
    ap.add_argument("--measured-ms", default="",
                    help="comma list stage=ms from the trace table, e.g. "
                         "stage1=54,crops=25,embed=7,step=109")
    args = ap.parse_args()
    h, w = map(int, args.res.split("x"))
    measured = {}
    for part in filter(None, args.measured_ms.split(",")):
        k, v = part.split("=")
        measured[k] = float(v)

    import jax
    import jax.numpy as jnp

    from truely_tpu.config import DetectorConfig
    from truely_tpu.pipeline.detector import Detector, _frame_step
    from truely_tpu.pipeline import mtcnn as M

    config = DetectorConfig(frame_batch=args.batch)
    det = Detector(config)
    cfg = config.mtcnn
    dt = jnp.dtype(config.compute_dtype)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, h, w, 3), dtype=np.uint8)
    )

    # Whole fused step — ground truth (the executable bench.py times).
    step = jax.jit(partial(_frame_step, cfg=config, compute_dtype=dt))
    f, b = cost(step, det.params, frames)
    total = row("step(fused,whole)", f, b, measured.get("step"))

    # Stage 1: pyramid + P-Net trunk + global top-k selection.
    s1 = jax.jit(
        partial(M._stage1, cfg=cfg, dtype=dt, precision=None)
    )
    f1, b1 = cost(s1, det.params.mtcnn, frames)
    row("stage1(pyramid+pnet+select)", f1, b1, measured.get("stage1"))

    # Stages 2-3: crop prep + R-Net/O-Net (needs stage-1 outputs: use
    # dummies at capacity shapes — cost is shape-determined).
    boxes = jnp.zeros((args.batch, cfg.pnet_topk_total, 4), jnp.float32)
    scores = jnp.zeros((args.batch, cfg.pnet_topk_total), jnp.float32)
    valid = jnp.ones((args.batch, cfg.pnet_topk_total), bool)

    def stages23(params, frames, boxes, scores, valid):
        prep = M._prep_crop_frames(frames, cfg, dtype=dt, precision=None)
        k2 = min(cfg.rnet_capacity, boxes.shape[1])
        return M._stages23(
            params, prep, boxes, scores, valid, cfg,
            w=frames.shape[2], h=frames.shape[1],
            k2=k2, k3=min(cfg.onet_capacity, k2),
            dtype=dt, precision=None,
        )

    s23 = jax.jit(stages23)
    f2, b2 = cost(s23, det.params.mtcnn, frames, boxes, scores, valid)
    row("stages23(crops+rnet+onet)", f2, b2, measured.get("crops"))

    # Embed tail: 80x80 crop + FaceNet + landmark head.
    from truely_tpu.pipeline.detector import _embed_tail

    box1 = jnp.asarray(
        rng.uniform(0, min(h, w) // 2, (args.batch, 4)), jnp.float32
    )
    tail = jax.jit(
        partial(_embed_tail, cfg=config, compute_dtype=dt)
    )
    f3, b3 = cost(tail, det.params, frames, box1, jnp.ones((args.batch,), bool))
    row("embed_tail(crop+facenet+landmark)", f3, b3, measured.get("embed"))

    print(json.dumps({
        "note": "stage-sliced jits lose cross-stage fusion; the fused "
                "whole-step row is ground truth",
        "stage_sum_gflops": round((f1 + f2 + f3) / 1e9, 1),
        "step_gflops": total["gflops"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
