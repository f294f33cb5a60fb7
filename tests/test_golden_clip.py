"""Golden-file regression on the bundled Veo-3 test clip (BASELINE config 1).

The reference repo ships exactly one test artifact: a 360p Veo-3 clip
(test/*.mp4, SURVEY.md §2.1 #17).  With the deterministic seeded fallback
weights, the full pipeline's outputs on its first 200 frames are pinned in
tests/golden/veo3_first200_seeded.json (regenerate: scripts/regen_golden.py).

Backend robustness: with seeded weights the cosine similarities cluster
knife-edge around the 0.99 threshold (min margin ~8e-4), so tiny f32
backend drift (CPU vs TPU) could legitimately flip individual run-length
decisions.  The test is therefore split into two layers:

1. NUMERICS — sims/boxes/face-presence must match the pinned fixture
   within a tolerance far below any semantic change (the golden run is
   pinned to float32 + HIGHEST matmul precision for this reason).
2. SEMANTICS — flags, counters, final_counter, flagged_count, and the
   0-100 score must EXACTLY equal an independent pure-Python re-statement
   of the reference loop (server/model.py:60-95) applied to the
   *measured* sims.  This pins the decision logic bit-exactly without
   being hostage to knife-edge numerics.

Additionally, when every pinned sim clears the threshold by more than the
numeric tolerance, the decision outputs must also exactly match the pinned
fixture (the strongest form, automatically active when not knife-edge).

Note: this anchors *our* pipeline, not parity with the CPU reference — the
upstream pretrained weights are not fetchable in this environment
(BASELINE.md); once converted weights exist, a second golden file against
the true reference output slots in beside this one.
"""

import json
import math
import os

import numpy as np
import pytest
import cv2
import jax

from truely_tpu.config import DetectorConfig
from truely_tpu.pipeline.detector import Detector

from tests.clip import bundled_clip_path
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "veo3_first200_seeded.json")

# Must match scripts/regen_golden.py GOLDEN_CONFIG exactly.
GOLDEN_CONFIG = DetectorConfig(frame_batch=16, compute_dtype="float32")

# Max tolerated f32 numeric drift between backends on the pinned run.
SIM_ATOL = 2e-4


def reference_loop(sims, annotated, n_sampled, frame_count, fps,
                   *, thr=0.99, run_len=15, long_seconds=30):
    """Pure-Python re-statement of the reference's sequential scoring loop
    (server/model.py:60-95): resettable run-length counter over sampled
    frames, flag on counter > run_len, then the weighted score formula
    (including the reused-loop-variable quirk at model.py:90)."""
    counter = 0
    flags, counters = [], []
    for sim, upd in zip(sims, annotated):
        if upd:
            counter = counter + 1 if sim < thr else 0
        flags.append(bool(upd and counter > run_len))
        counters.append(counter)
    flagged_count = sum(flags)
    total = max(n_sampled, 1)
    pct = flagged_count / total * 100.0
    conf = min(pct * (counter / float(run_len)), 100.0)
    weight = 0.5 if frame_count > fps * long_seconds else 0.3
    score = int(min(max(math.floor(min(pct + conf * weight, 100.0)), 0), 100))
    if n_sampled == 0:
        score = 0
    return flags, counters, counter, flagged_count, score


@pytest.mark.skipif(not bundled_clip_path(), reason="bundled clip not present")
def test_bundled_clip_matches_golden():
    cap = cv2.VideoCapture(bundled_clip_path())
    frames = []
    while len(frames) < 200:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    frames = np.stack(frames)
    assert frames.shape == (200, 360, 640, 3)

    det = Detector(GOLDEN_CONFIG)
    with jax.default_matmul_precision("highest"):
        res = det.analyze_frames(frames, fps=30)

    with open(GOLDEN) as f:
        golden = json.load(f)

    # --- Layer 1: numerics vs the pinned fixture -----------------------
    assert [r.has_face for r in res.records] == golden["has_face"]
    assert [r.annotated for r in res.records] == golden["annotated"]
    np.testing.assert_allclose(
        [list(r.box) for r in res.records], golden["boxes"], atol=1.0
    )
    sims = [r.similarity for r in res.records]
    np.testing.assert_allclose(sims, golden["sims"], atol=SIM_ATOL)
    assert res.total_processed == golden["total_processed"]

    # --- Layer 2: decision semantics on the measured sims --------------
    flags, counters, final_counter, flagged_count, score = reference_loop(
        sims, [r.annotated for r in res.records],
        res.total_processed, res.frame_count, res.fps,
        thr=GOLDEN_CONFIG.similarity_threshold,
        run_len=GOLDEN_CONFIG.run_length_threshold,
        long_seconds=GOLDEN_CONFIG.long_video_seconds,
    )
    assert [r.flagged for r in res.records] == flags
    assert [r.counter for r in res.records] == counters
    assert res.final_counter == final_counter
    assert res.flagged_count == flagged_count
    assert res.fake_score == score

    # --- Strongest form: exact fixture match when not knife-edge -------
    if golden.get("min_sim_margin", 0.0) > 10 * SIM_ATOL:
        assert res.fake_score == golden["fake_score"]
        assert res.flagged_count == golden["flagged_count"]
        assert res.final_counter == golden["final_counter"]
        assert res.suspicious_frames == golden["suspicious_frames"]
