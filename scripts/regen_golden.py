"""Regenerate tests/golden/veo3_first200_seeded.json from HEAD.

The golden fixture anchors OUR pipeline (seeded fallback weights) on the
reference's bundled Veo-3 clip — reference parity contract: the loop
semantics of server/model.py:42-95.  To keep it backend-robust (the same
fixture must pass on CPU *and* TPU), the golden run is pinned to
float32 compute + HIGHEST matmul precision, and the fixture records the
minimum |sim - threshold| margin so knife-edge decisions are rejected at
regeneration time rather than flaking later.

Usage (CPU is the default and what CI uses):
    python scripts/regen_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("GOLDEN_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import cv2  # noqa: E402

from truely_tpu.config import DetectorConfig  # noqa: E402
from truely_tpu.pipeline.detector import Detector  # noqa: E402

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from tests.clip import bundled_clip_path
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "veo3_first200_seeded.json")

# Must match tests/test_golden_clip.py GOLDEN_CONFIG exactly.
GOLDEN_CONFIG = DetectorConfig(frame_batch=16, compute_dtype="float32")


def load_frames(n=200):
    cap = cv2.VideoCapture(bundled_clip_path())
    frames = []
    while len(frames) < n:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def main():
    frames = load_frames()
    assert frames.shape == (200, 360, 640, 3), frames.shape
    det = Detector(GOLDEN_CONFIG)
    with jax.default_matmul_precision("highest"):
        res = det.analyze_frames(frames, fps=30)

    sims = [r.similarity for r in res.records]
    thr = GOLDEN_CONFIG.similarity_threshold
    margins = [abs(s - thr) for s, r in zip(sims, res.records) if r.annotated]
    min_margin = min(margins) if margins else float("inf")
    print(f"min |sim-{thr}| margin over annotated frames: {min_margin:.6f}")
    if min_margin < 5e-3:
        print("WARNING: knife-edge similarity — fixture may be backend-"
              "brittle; consider different seeds or thresholds.")

    golden = {
        "config": {
            "frame_batch": GOLDEN_CONFIG.frame_batch,
            "compute_dtype": GOLDEN_CONFIG.compute_dtype,
            "matmul_precision": "highest",
            "backend_generated_on": jax.default_backend(),
        },
        "min_sim_margin": min_margin,
        "fake_score": res.fake_score,
        "total_processed": res.total_processed,
        "flagged_count": res.flagged_count,
        "final_counter": res.final_counter,
        "suspicious_frames": res.suspicious_frames,
        "has_face": [r.has_face for r in res.records],
        "annotated": [r.annotated for r in res.records],
        "boxes": [list(r.box) for r in res.records],
        "sims": sims,
        "counters": [r.counter for r in res.records],
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {os.path.abspath(OUT)}")
    print(f"fake_score={res.fake_score} flagged={res.flagged_count} "
          f"final_counter={res.final_counter} "
          f"suspicious={len(res.suspicious_frames)}")


if __name__ == "__main__":
    main()
