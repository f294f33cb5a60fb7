"""Track-propagated MULTI-FACE detection (``detect_interval=K`` with
``multi_face`` — BASELINE config 4 composed with the round-4 propagate mode).

The reference re-runs the full cascade per frame and keeps only ``boxes[0]``
(/root/reference/server/model.py:47-49); our multi-face path tracks up to
``max_tracks`` faces, and with K>1 runs the full cascade only on keyframes,
refining every track's box between through the T-seed stage-2/3 entry point
(pipeline/mtcnn.refine_faces_multi).

Contracts pinned here (CPU, float32 — the exact-operator configuration):

- ``detect_interval=1`` is bit-identical to the default multi-face path;
- keyframe rows produce bit-identical boxes/valid/embeddings to full mode
  even at K>1 (their seed IS their own full detection, passed through the
  shared ``_multiface_tail``);
- frames whose seeds are all invalid never detect (seed gating per slot);
- ``propagate_fallback`` re-runs full detection on a segment whose T-seed
  refinement collapses, restoring full-mode tracking end to end;
- the video path (decode segments, keyframes host-gathered across K
  uploaded segments) agrees exactly with the in-memory frames path.
"""

import numpy as np
import pytest
import cv2
import jax
import jax.numpy as jnp

from truely_tpu.config import DetectorConfig, MTCNNConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.mtcnn import MTCNNParams, refine_faces_multi

F32 = dict(compute_dtype="float32")
# Random weights need permissive thresholds + small capacities to detect.
MT = dict(
    multi_face=True,
    mtcnn=MTCNNConfig(
        pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
        thresholds=(0.5, 0.3, 0.2),
    ),
)


@pytest.fixture(scope="module")
def blurred_frames():
    rng = np.random.default_rng(0)
    return np.stack([
        cv2.blur(rng.integers(0, 256, (64, 96, 3), np.uint8), (9, 9))
        for _ in range(32)
    ])


@pytest.fixture(scope="module")
def full_result(blurred_frames):
    det = Detector(DetectorConfig(frame_batch=8, **MT, **F32))
    return det.analyze_frames_tracks(blurred_frames, fps=10)


def _state_tuple(state):
    return jax.tree_util.tree_map(np.asarray, tuple(state))


def test_detect_interval_one_is_identity(blurred_frames, full_result):
    det = Detector(
        DetectorConfig(frame_batch=8, detect_interval=1, **MT, **F32)
    )
    score, per_track, state = det.analyze_frames_tracks(blurred_frames, fps=10)
    f_score, f_per_track, f_state = full_result
    assert score == f_score
    assert np.array_equal(per_track, f_per_track)
    for a, b in zip(_state_tuple(state), _state_tuple(f_state)):
        assert np.array_equal(a, b)


def test_keyframes_bit_identical_at_k4(blurred_frames):
    det = Detector(
        DetectorConfig(frame_batch=8, detect_interval=4, **MT, **F32)
    )
    det._ensure_track_jits()
    stack = jnp.asarray(blurred_frames[:8])
    boxes, valid, emb = map(np.asarray, det._mstep(det.params, stack))
    assert valid.any(), "blurred fixture should detect with these thresholds"
    kb, kv = boxes[::4], valid[::4]
    pb, pv, pe = map(
        np.asarray,
        det._ensure_mprop_step(False)(
            det.params, stack, jnp.asarray(kb), jnp.asarray(kv)
        ),
    )
    assert np.array_equal(pb[::4], kb)
    assert np.array_equal(pv[::4], kv)
    assert np.array_equal(pe[::4], emb[::4])
    # Refinement between keyframes actually finds faces on this content.
    assert pv[1::4].any() or pv[2::4].any() or pv[3::4].any()


def test_all_invalid_seeds_never_detect():
    from truely_tpu.models import init_pnet, init_rnet, init_onet

    key = jax.random.PRNGKey(0)
    params = MTCNNParams(
        pnet=init_pnet(key), rnet=init_rnet(key), onet=init_onet(key)
    )
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 256, (4, 96, 128, 3), np.uint8))
    seeds = jnp.broadcast_to(
        jnp.asarray([20.0, 20.0, 70.0, 70.0]), (4, 3, 4)
    )
    valid = jnp.asarray([[True] * 3, [False] * 3, [True] * 3, [False] * 3])
    cfg = MTCNNConfig(thresholds=(0.5, 0.1, 0.05))
    det = refine_faces_multi(
        params, frames, seeds, valid, cfg, dtype=jnp.float32
    )
    got = np.asarray(jnp.any(det.valid, axis=1))
    assert not got[1] and not got[3], "unseeded frames must not detect"


def _force_refine_loss(det):
    """Wrap the multi-face refinement step so every slot reports invalid
    (simulating total tracking loss, e.g. a scene cut)."""
    real = det._ensure_mprop_step(False)

    def lossy(params, frames, sb, sv):
        boxes, valid, emb = real(params, frames, sb, sv)
        return boxes, jnp.zeros_like(valid), emb

    det._mprop_cache[(False, None)] = lossy


def test_fallback_restores_full_tracking(blurred_frames, full_result):
    det = Detector(
        DetectorConfig(
            frame_batch=8, detect_interval=4, propagate_fallback=True,
            **MT, **F32,
        )
    )
    _force_refine_loss(det)
    score, per_track, state = det.analyze_frames_tracks(blurred_frames, fps=10)
    f_score, f_per_track, f_state = full_result
    # Every segment's refinement collapses -> every segment re-runs full
    # detection -> final track state identical to full mode, bit for bit.
    assert score == f_score
    assert np.array_equal(per_track, f_per_track)
    for a, b in zip(_state_tuple(state), _state_tuple(f_state)):
        assert np.array_equal(a, b)


def test_no_fallback_refined_rows_stand(blurred_frames):
    from truely_tpu.pipeline.detector import _MemSegment, _upload_segments

    det = Detector(
        DetectorConfig(
            frame_batch=8, detect_interval=4, propagate_fallback=False,
            **MT, **F32,
        )
    )
    det._ensure_track_jits()
    _force_refine_loss(det)

    def seg_iter():
        for s in range(0, 32, 8):
            yield _MemSegment(sampled=blurred_frames[s : s + 8], n_valid=8)

    for seg, (_boxes, valid, _emb) in det._msegment_outputs(
        _upload_segments(seg_iter()), det._mstep, yuv=False
    ):
        v = np.asarray(valid)
        assert not v.any(), "lossy refinement must stand without fallback"


def test_mesh_multiface_propagate_matches_unsharded(blurred_frames):
    """DP-sharded multi-face propagate (frames split over 'data', the tiny
    (B/K, T) seeds replicated) is exact vs single-device at K=4 — the
    sharding mirrors `parallel.sharding.shard_frame_step(multiface=True,
    propagate=True)` and the driver dryrun's section 2e."""
    from truely_tpu.parallel.mesh import make_mesh

    cfg = DetectorConfig(frame_batch=8, detect_interval=4, **MT, **F32)
    solo = Detector(cfg)
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    sharded = Detector(cfg, mesh=mesh)
    score_a, per_a, state_a = solo.analyze_frames_tracks(blurred_frames, fps=10)
    score_b, per_b, state_b = sharded.analyze_frames_tracks(
        blurred_frames, fps=10
    )
    assert score_b == score_a
    assert np.array_equal(per_a, per_b)
    # Discrete state (counters, validity, ids) must match exactly; carried
    # float state (boxes, embeddings) is allclose-tight — the SPMD compile
    # lowers the refine convs at per-shard batch 2 with different FMA
    # ordering than the 8-row local compile, a last-ULP effect that never
    # moves a decision (scores above are exact).
    for a, b in zip(_state_tuple(state_a), _state_tuple(state_b)):
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        else:
            assert np.array_equal(a, b)


def test_shard_frame_step_multiface_matches_local(blurred_frames):
    """The public `shard_frame_step(multiface=True)` surfaces (full and
    propagate) return exactly what the local jits return."""
    from truely_tpu.parallel.mesh import make_mesh
    from truely_tpu.parallel.sharding import replicate, shard_frame_step

    cfg = DetectorConfig(frame_batch=8, detect_interval=4, **MT, **F32)
    det = Detector(cfg)
    det._ensure_track_jits()
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    params = replicate(mesh, det.params)
    stack = jnp.asarray(blurred_frames[:8])

    # Validity (the decisions) must match exactly; boxes/embeddings are
    # allclose-tight (SPMD lowers the convs at per-shard batch 2 with
    # different FMA ordering than the local 8-row compile — last-ULP only).
    full = shard_frame_step(mesh, cfg, multiface=True)
    lb, lv, le = map(np.asarray, det._mstep(det.params, stack))
    sb, sv, se = map(np.asarray, full(params, stack))
    assert np.array_equal(sv, lv)
    np.testing.assert_allclose(sb, lb, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(se, le, rtol=1e-5, atol=1e-5)

    prop = shard_frame_step(mesh, cfg, multiface=True, propagate=True)
    seeds, svalid = jnp.asarray(lb[::4]), jnp.asarray(lv[::4])
    pl = list(map(np.asarray, det._ensure_mprop_step(False)(
        det.params, stack, seeds, svalid
    )))
    ps = list(map(np.asarray, prop(params, stack, seeds, svalid)))
    assert np.array_equal(ps[1], pl[1])
    np.testing.assert_allclose(ps[0], pl[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ps[2], pl[2], rtol=1e-5, atol=1e-5)


def test_analyze_video_matches_frames_at_k4(tmp_path, blurred_frames):
    # The video path runs the macro-cycle orchestration over real decode
    # segments (keyframes host-gathered across K uploaded segments); it
    # must agree exactly with the in-memory frames path on identical
    # content, and the annotated output must encode.
    path = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64)
    )
    assert writer.isOpened()
    rng = np.random.default_rng(7)
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
        DetectorConfig(frame_batch=8, detect_interval=4, **MT, **F32)
    )
    out_path = str(tmp_path / "out.mp4")
    v_score, v_tracks, v_state = det.analyze_video_multiface(path, out_path)
    f_score, f_tracks, f_state = det.analyze_frames_tracks(frames, fps=10)
    assert v_score == f_score
    assert np.array_equal(v_tracks, f_tracks)
    for a, b in zip(_state_tuple(v_state), _state_tuple(f_state)):
        assert np.array_equal(a, b)
    import os

    assert os.path.getsize(out_path) > 0
    # Non-vacuous fixture: some track actually accumulated consecutive-
    # frame updates (otherwise the state equalities above prove nothing).
    assert np.asarray(v_state.processed).sum() > 0
