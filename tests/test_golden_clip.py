"""Golden-file regression on the bundled Veo-3 test clip (BASELINE config 1).

The reference repo ships exactly one test artifact: a 360p Veo-3 clip
(test/*.mp4, SURVEY.md §2.1 #17).  With the deterministic seeded fallback
weights, the full pipeline's outputs on its first 200 frames are pinned in
tests/golden/veo3_first200_seeded.json: score, face presence, boxes,
similarities, and the suspicious-frame list.  Any numerical drift anywhere
in the stack (resize, cascade, NMS, embedder, scan, scoring) trips this.

Note: this anchors *our* pipeline, not parity with the CPU reference — the
upstream pretrained weights are not fetchable in this environment
(BASELINE.md); once converted weights exist, a second golden file against
the true reference output slots in beside this one.
"""

import glob
import json
import os

import numpy as np
import pytest
import cv2

from truely_tpu.config import DetectorConfig
from truely_tpu.pipeline.detector import Detector

CLIP_GLOB = "/root/reference/test/*.mp4"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "veo3_first200_seeded.json")


@pytest.mark.skipif(not glob.glob(CLIP_GLOB), reason="bundled clip not present")
def test_bundled_clip_matches_golden():
    cap = cv2.VideoCapture(glob.glob(CLIP_GLOB)[0])
    frames = []
    while len(frames) < 200:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    frames = np.stack(frames)
    assert frames.shape == (200, 360, 640, 3)

    det = Detector(DetectorConfig(frame_batch=16))
    res = det.analyze_frames(frames, fps=30)

    with open(GOLDEN) as f:
        golden = json.load(f)

    assert res.fake_score == golden["fake_score"]
    assert res.total_processed == golden["total_processed"]
    assert res.flagged_count == golden["flagged_count"]
    assert res.final_counter == golden["final_counter"]
    assert res.suspicious_frames == golden["suspicious_frames"]
    assert [r.has_face for r in res.records] == golden["has_face"]
    np.testing.assert_allclose(
        [list(r.box) for r in res.records], golden["boxes"], atol=1.0
    )
    np.testing.assert_allclose(
        [r.similarity for r in res.records], golden["sims"], atol=1e-3
    )
