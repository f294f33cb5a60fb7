"""Track-propagated detection mode (``detect_interval=K``).

The reference runs the full pyramid + P-Net cascade on EVERY sampled frame
(/root/reference/server/model.py:47).  Propagate mode runs it only on every
K-th sampled frame and refines the frames between from the keyframe's box
through the unchanged stage-2/3 machinery (pipeline/mtcnn.refine_faces).

Contracts pinned here (CPU, float32 — the exact-operator configuration):

- ``detect_interval=1`` is bit-identical to the default full-detection path
  (the flag defaults off and K=1 must never perturb parity/golden runs);
- keyframe frames produce bit-identical boxes/has_face to full mode even at
  K>1 (their seed IS their own full detection, passed straight through);
- frames whose keyframe found no face never detect (``seed_valid`` gating);
- ``propagate_fallback`` re-runs full detection on a segment whose
  refinement collapses, restoring full-mode outputs end to end.
"""

import numpy as np
import pytest
import cv2
import jax
import jax.numpy as jnp

from truely_tpu.config import DetectorConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.mtcnn import MTCNNParams, refine_faces

from tests.clip import bundled_clip_path

F32 = dict(compute_dtype="float32")


@pytest.fixture(scope="module")
def clip_frames():
    cap = cv2.VideoCapture(bundled_clip_path())
    frames = []
    while len(frames) < 64:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


@pytest.fixture(scope="module")
def full_result(clip_frames):
    det = Detector(DetectorConfig(frame_batch=8, **F32))
    return det.analyze_frames(clip_frames, fps=30)


def test_detect_interval_one_is_identity(clip_frames, full_result):
    det = Detector(DetectorConfig(frame_batch=8, detect_interval=1, **F32))
    res = det.analyze_frames(clip_frames, fps=30)
    assert res.fake_score == full_result.fake_score
    for a, b in zip(res.records, full_result.records):
        assert (a.box, a.has_face, a.similarity, a.flagged, a.counter) == (
            b.box, b.has_face, b.similarity, b.flagged, b.counter
        )


def test_keyframes_bit_identical_at_k4(clip_frames, full_result):
    # 16 sampled frames over batch 8 => 2 segments, K=4 => a PARTIAL
    # keyframe cycle (2 of 4 segments), exercising the padded seed batch.
    det = Detector(DetectorConfig(frame_batch=8, detect_interval=4, **F32))
    res = det.analyze_frames(clip_frames, fps=30)
    assert len(res.records) == len(full_result.records)
    n_face = 0
    for i in range(0, len(res.records), 4):  # keyframes
        a, b = res.records[i], full_result.records[i]
        assert a.has_face == b.has_face
        assert a.box == b.box
        n_face += a.has_face
    assert n_face > 0, "fixture keyframes should detect (seeded weights do)"


def test_seed_invalid_frames_never_detect():
    from truely_tpu.models import init_pnet, init_rnet, init_onet

    key = jax.random.PRNGKey(0)
    params = MTCNNParams(
        pnet=init_pnet(key), rnet=init_rnet(key), onet=init_onet(key)
    )
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 256, (4, 96, 128, 3), np.uint8))
    seeds = jnp.asarray(
        [[20.0, 20.0, 70.0, 70.0]] * 4, jnp.float32
    )
    valid = jnp.asarray([True, False, True, False])
    det = refine_faces(params, frames, seeds, valid, dtype=jnp.float32)
    got = np.asarray(jnp.any(det.valid, axis=1))
    assert not got[1] and not got[3], "unseeded frames must not detect"


def _force_refine_loss(det):
    """Wrap the detector's refinement step so it always reports no face
    (simulating total tracking loss, e.g. a scene cut)."""
    real = det._ensure_propagate_step(False)

    def lossy(params, frames, sb, sv):
        out = real(params, frames, sb, sv)
        return out._replace(has_face=jnp.zeros_like(out.has_face))

    det._step_prop = lossy


def test_fallback_restores_full_outputs(clip_frames, full_result):
    det = Detector(
        DetectorConfig(
            frame_batch=8, detect_interval=4, propagate_fallback=True, **F32
        )
    )
    _force_refine_loss(det)
    res = det.analyze_frames(clip_frames, fps=30)
    # Every segment's refinement collapses -> every segment re-runs full
    # detection -> outputs identical to full mode, bit for bit.
    assert res.fake_score == full_result.fake_score
    for a, b in zip(res.records, full_result.records):
        assert (a.box, a.has_face, a.similarity, a.flagged) == (
            b.box, b.has_face, b.similarity, b.flagged
        )


def test_no_fallback_accepts_refinement(clip_frames):
    det = Detector(
        DetectorConfig(
            frame_batch=8, detect_interval=4, propagate_fallback=False, **F32
        )
    )
    _force_refine_loss(det)
    res = det.analyze_frames(clip_frames, fps=30)
    for i, r in enumerate(res.records):
        if i % 4 != 0:
            assert not r.has_face, "lossy refinement must stand without fallback"


def test_analyze_video_matches_analyze_frames_at_k4(tmp_path):
    # The video path runs the macro-cycle orchestration over real decode
    # segments (keyframes host-gathered across K uploaded segments, YUV
    # ingestion when eligible); it must agree exactly with the in-memory
    # frames path on identical content.  72 frames / batch 8 / K=4 =>
    # 2 full keyframe cycles + 1 partial.
    from truely_tpu.config import MTCNNConfig

    path = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64)
    )
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(72):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8), (9, 9)
        ))
    writer.release()
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        frames.append(f)
    cap.release()
    frames = np.stack(frames)

    det = Detector(
        DetectorConfig(
            frame_batch=8, detect_interval=4,
            mtcnn=MTCNNConfig(
                pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
                thresholds=(0.5, 0.3, 0.2),  # random weights: permissive
            ),
            **F32,
        )
    )
    r_video = det.analyze_video(path)
    r_frames = det.analyze_frames(frames, fps=10)
    assert r_video.fake_score == r_frames.fake_score
    assert r_video.flagged_count == r_frames.flagged_count
    assert [r.frame_index for r in r_video.records] == [
        r.frame_index for r in r_frames.records
    ]
    for a, b in zip(r_video.records, r_frames.records):
        assert (a.has_face, a.box, a.flagged) == (b.has_face, b.box, b.flagged)
    assert any(r.has_face for r in r_video.records)


def test_batch_divisibility_validated():
    with pytest.raises(ValueError, match="divisible"):
        Detector(DetectorConfig(frame_batch=8, detect_interval=3, **F32))
    with pytest.raises(ValueError, match=">= 1"):
        Detector(DetectorConfig(frame_batch=8, detect_interval=0, **F32))


def test_detect_only_seed_step_matches_full_step(clip_frames):
    """The cascade-only keyframe seed step (round 5: _frame_step_detect /
    _multiface_detect — the embed tail's keyframe outputs were discarded
    by the orchestration, advisor r4) returns exactly the full step's
    (box, has_face) / (boxes, valid): the propagate orchestrations may
    swap one for the other without any decision change."""
    det = Detector(DetectorConfig(frame_batch=8, detect_interval=2, **F32))
    frames = jnp.asarray(clip_frames[:8])
    full = det.step_device(frames)
    box, hf = det._ensure_detect_step(False)(det.params, frames)
    assert np.array_equal(np.asarray(box), np.asarray(full.box))
    assert np.array_equal(np.asarray(hf), np.asarray(full.has_face))

    mdet = Detector(DetectorConfig(
        frame_batch=8, detect_interval=2, multi_face=True, **F32
    ))
    mdet._ensure_track_jits()
    mboxes, mvalid, _ = mdet._mstep(mdet.params, frames)
    dboxes, dvalid = mdet._ensure_mdetect_step(False)(mdet.params, frames)
    assert np.array_equal(np.asarray(dboxes), np.asarray(mboxes))
    assert np.array_equal(np.asarray(dvalid), np.asarray(mvalid))
