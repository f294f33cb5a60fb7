#!/usr/bin/env python3
"""Characterize the production fast path's decision drift vs the exact
parity chain (VERDICT r2 task 1b).

The headline benchmark runs the production defaults — bf16 compute,
cascaded pyramid resample, stage_crop_quant=4 — while every parity proof
pins f32 + exact resample + exact crops.  This script measures what the
fast path actually does to the *decision quantities* on real clip frames:
for N weight seeds, both operator chains run the same sampled frames of
the bundled fixture with identical weights, and we compare

- per-frame cosine similarity (the thresholded quantity, model.py:16),
- the per-frame drifting verdict (sim < 0.99) and flagged records,
- detector boxes and has_face,
- the final fake score,

reporting |Δsim| against each frame's own margin |sim_exact − threshold|
so "drift" is stated relative to how close the decision ever was.
Results are recorded in PERFORMANCE.md ("Fast-path drift").

Run on the TPU (the fast path's bf16/MXU behavior is what's being
characterized): ``timeout 560 python scripts/measure_drift.py [--seeds N]``.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def sampled_fixture_frames(interval=4, res=360):
    """Fixture frames at the requested bucket: native 360p, or bilinear
    upscale to the 720p/1080p buckets (same content — the per-bucket rows
    characterize the production operators at each bucket's pyramid/crop
    shapes, not new footage)."""
    import cv2

    from tests.clip import bundled_clip_path

    sizes = {360: (640, 360), 720: (1280, 720), 1080: (1920, 1080)}
    cap = cv2.VideoCapture(bundled_clip_path())
    frames = []
    idx = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        if idx % interval == 0:
            if res != 360:
                f = cv2.resize(f, sizes[res], interpolation=cv2.INTER_LINEAR)
            frames.append(f)
        idx += 1
    cap.release()
    return np.stack(frames)  # (240, H, W, 3) BGR


def seeded_params(seed):
    import jax

    from truely_tpu.models import (
        init_inception_resnet_v1, init_landmark68, init_onet, init_pnet,
        init_rnet,
    )
    from truely_tpu.pipeline.detector import DetectorParams
    from truely_tpu.pipeline.mtcnn import MTCNNParams

    k = jax.random.split(jax.random.PRNGKey(1000 + seed), 5)
    return DetectorParams(
        mtcnn=MTCNNParams(
            pnet=init_pnet(k[0]), rnet=init_rnet(k[1]), onet=init_onet(k[2])
        ),
        facenet=init_inception_resnet_v1(k[3]),
        landmark=init_landmark68(k[4]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--res", type=int, default=360, choices=(360, 720, 1080),
                    help="resolution bucket (720/1080 upscale the fixture)")
    ap.add_argument("--variants", default="",
                    help="comma-separated subset of variant names to run "
                         "(default: all; big buckets want a subset)")
    args = ap.parse_args()

    import jax

    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    frames = sampled_fixture_frames(res=args.res)
    n = frames.shape[0]
    thresh = 0.99

    # Permissive stage thresholds so random weights produce detections on
    # most frames (as the oracle/detector tests do); identical for every
    # chain so the ONLY differences are the fast-path operators.  Each
    # fast-path lever is also measured ALONE against the exact chain so
    # drift is attributed, not just totaled.
    common = dict(thresholds=(0.5, 0.3, 0.2))

    def make(dtype, cascade, quant, k=1):
        return Detector(DetectorConfig(
            frame_batch=args.batch, compute_dtype=dtype, detect_interval=k,
            mtcnn=MTCNNConfig(
                pyramid_cascade=cascade, stage_crop_quant=quant, **common
            ),
        ))

    # NOTE: the cascade/quant levers are hard-gated to bf16 + default
    # precision (pipeline/mtcnn.py) — any f32 config gets the exact
    # operators regardless of the flags (verified: f32+cascade/f32+q4
    # measured ZERO drift vs exact across 20 seeds x 240 frames).  So the
    # decomposition runs inside the bf16 world: bf16 alone is the dtype
    # effect, and each lever's marginal effect is its row minus bf16_only.
    # detect_interval is STRUCTURAL (which frames get full detection), so
    # its rows compose it onto the full fast path — the production shape.
    det_exact = make("float32", False, 1)
    factories = {
        "full_fast(bf16+cascade+q4)": lambda: make("bfloat16", True, 4),
        "bf16_only": lambda: make("bfloat16", False, 1),
        "bf16_cascade_q1": lambda: make("bfloat16", True, 1),
        "bf16_nocascade_q4": lambda: make("bfloat16", False, 4),
        "full_fast_q8(bf16+cascade+q8)": lambda: make("bfloat16", True, 8),
        "full_fast_propagate_k4": lambda: make("bfloat16", True, 4, k=4),
        "full_fast_propagate_k8": lambda: make("bfloat16", True, 4, k=8),
        # Adaptive ladder (detect_interval="auto", cap 8): rung choice is
        # content-driven, so the fixture run also reports the realized
        # keyframe/refine segment split (stderr) for the throughput story.
        "full_fast_auto": lambda: make("bfloat16", True, 4, k="auto"),
    }
    wanted = [v for v in args.variants.split(",") if v]
    for w in wanted:
        if w not in factories:
            ap.error(f"unknown variant {w!r}; choices: {list(factories)}")
    variants = {
        name: fn()
        for name, fn in factories.items()
        if not wanted or name in wanted
    }

    def iou(a, b):
        ax0, ay0, ax1, ay1 = a
        bx0, by0, bx1, by1 = b
        ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
        iy = max(0.0, min(ay1, by1) - max(ay0, by0))
        inter = ix * iy
        ua = max(0.0, (ax1 - ax0)) * max(0.0, (ay1 - ay0))
        ub = max(0.0, (bx1 - bx0)) * max(0.0, (by1 - by0))
        return inter / (ua + ub - inter) if (ua + ub - inter) > 0 else 0.0

    # Two effects are separated per variant: (1) SELECTION flips — a
    # different candidate box wins under the perturbed scoring (knife-edge
    # by construction with random weights: every candidate is noise, so ε
    # score drift reorders them); (2) OPERATOR drift — same face selected
    # (box IoU >= 0.5), how far do the decision quantities move.  (2) is
    # what transfers to real weights on stable detections; (1) is a rate.
    class Acc:
        def __init__(self):
            self.dsim, self.margins, self.box_drift = [], [], []
            self.face_mismatch = self.sel_flips = self.both_face = 0
            self.verdict_mismatch = self.flag_mismatch = 0
            self.score_pairs = []

    accs = {name: Acc() for name in variants}
    for seed in range(args.seeds):
        params = jax.device_put(seeded_params(seed))
        det_exact.params = params
        res_e = det_exact.analyze_frames(frames, fps=7)  # interval 1
        line = [f"seed {seed}: exact={res_e.fake_score}"]
        for name, det in variants.items():
            det.params = params
            res_f = det.analyze_frames(frames, fps=7)
            acc = accs[name]
            acc.score_pairs.append((res_f.fake_score, res_e.fake_score))
            line.append(f"{name}={res_f.fake_score}")
            if det._auto_interval:
                line.append(
                    f"[auto kf={det.auto_keyframe_segments} "
                    f"refine={det.auto_refine_segments} "
                    f"k_end={det.auto_interval_current}]"
                )
                det.auto_keyframe_segments = 0
                det.auto_refine_segments = 0
            assert len(res_f.records) == len(res_e.records) == n
            for rf, re_ in zip(res_f.records, res_e.records):
                if rf.has_face != re_.has_face:
                    acc.face_mismatch += 1
                    continue
                if not rf.has_face:
                    continue
                acc.both_face += 1
                if iou(rf.box, re_.box) < 0.5:
                    acc.sel_flips += 1
                    continue
                dsim = abs(rf.similarity - re_.similarity)
                acc.dsim.append(dsim)
                acc.margins.append(abs(re_.similarity - thresh))
                if (rf.similarity < thresh) != (re_.similarity < thresh):
                    acc.verdict_mismatch += 1
                if rf.flagged != re_.flagged:
                    acc.flag_mismatch += 1
                acc.box_drift.append(
                    max(abs(a - b) for a, b in zip(rf.box, re_.box))
                )
        print(" ".join(line), file=sys.stderr, flush=True)

    out = {"seeds": args.seeds, "frames_per_seed": n, "res": args.res,
           "variants": {}}
    for name, acc in accs.items():
        dsim = np.asarray(acc.dsim) if acc.dsim else np.zeros(1)
        margins = np.asarray(acc.margins) if acc.margins else np.ones(1)
        box_drift = np.asarray(acc.box_drift) if acc.box_drift else np.zeros(1)
        out["variants"][name] = {
            "frames_both_face": acc.both_face,
            "selection_flip_rate": round(
                acc.sel_flips / max(acc.both_face, 1), 4
            ),
            "has_face_mismatches": acc.face_mismatch,
            "matched_frames": len(acc.dsim),
            "dsim_mean": float(dsim.mean()),
            "dsim_p95": float(np.percentile(dsim, 95)),
            "dsim_max": float(dsim.max()),
            "margin_median": float(np.median(margins)),
            "frames_where_dsim_exceeds_margin": int((dsim >= margins).sum()),
            "drift_verdict_mismatches": acc.verdict_mismatch,
            "flagged_mismatches": acc.flag_mismatch,
            "box_drift_p95_px": float(np.percentile(box_drift, 95)),
            "score_pairs_differing": sum(
                1 for f, e in acc.score_pairs if f != e
            ),
            "score_abs_diff_max": max(
                abs(f - e) for f, e in acc.score_pairs
            ),
        }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
