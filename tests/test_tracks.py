"""Multi-face tracker tests: synthetic detections with known ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from truely_tpu.pipeline.tracks import (
    init_track_state, track_step, track_timeline, track_scores,
)


def det_inputs(boxes, valid, embs, k=4, d=8):
    """Pad per-frame detections to capacity K."""
    kb = np.zeros((k, 4), np.float32)
    kv = np.zeros((k,), bool)
    ke = np.zeros((k, d), np.float32)
    for i, (b, e) in enumerate(zip(boxes, embs)):
        kb[i] = b
        kv[i] = valid[i] if i < len(valid) else True
        ke[i] = e
    return jnp.asarray(kb), jnp.asarray(kv), jnp.asarray(ke)


BOX_A = [10, 10, 50, 50]
BOX_B = [200, 200, 260, 270]


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_single_track_counter_matches_reference_semantics():
    """One face, drifting embeddings: counter/flags must match the
    single-face run-length semantics."""
    d = 8
    state = init_track_state(2, d)
    e_stable = unit(np.ones(d))
    e_drift = [unit(np.ones(d) + np.random.default_rng(i).normal(size=d))
               for i in range(30)]

    # Frame 0: spawn.
    b, v, e = det_inputs([BOX_A], [True], [e_stable], d=d)
    state, out = track_step(state, b, v, e, run_length_threshold=3)
    assert bool(state.active[0]) and int(state.counter[0]) == 0

    # Frames 1..6: drift every frame -> counter 1..6, flag when > 3.
    flags = []
    for i in range(6):
        b, v, e = det_inputs([BOX_A], [True], [e_drift[i]], d=d)
        state, out = track_step(state, b, v, e, run_length_threshold=3)
        flags.append(bool(out.track_flagged[0]))
    assert int(state.counter[0]) == 6
    assert flags == [False, False, False, True, True, True]
    assert int(state.flagged_count[0]) == 3

    # Stable frame resets.
    prev = state.embedding[0]
    b, v, e = det_inputs([BOX_A], [True], [np.asarray(prev)], d=d)
    state, out = track_step(state, b, v, e, run_length_threshold=3)
    assert int(state.counter[0]) == 0


def test_two_faces_tracked_independently():
    d = 8
    state = init_track_state(4, d)
    ea, eb = unit(np.ones(d)), unit(np.arange(1, d + 1))
    for i in range(5):
        b, v, e = det_inputs([BOX_A, BOX_B], [True, True], [ea, eb], d=d)
        state, _ = track_step(state, b, v, e)
    assert int(state.active.sum()) == 2
    assert int(state.processed[0]) == 4 and int(state.processed[1]) == 4
    # identity preserved: track 0 follows BOX_A
    np.testing.assert_allclose(np.asarray(state.box[0]), BOX_A)
    np.testing.assert_allclose(np.asarray(state.box[1]), BOX_B)


def test_track_retires_after_misses():
    d = 8
    state = init_track_state(2, d)
    ea = unit(np.ones(d))
    b, v, e = det_inputs([BOX_A], [True], [ea], d=d)
    state, _ = track_step(state, b, v, e, max_misses=2)
    empty_b, empty_v, empty_e = det_inputs([], [], [], d=d)
    for _ in range(3):
        state, _ = track_step(state, empty_b, empty_v, empty_e, max_misses=2)
    assert not bool(state.active[0])


def test_track_follows_moving_box():
    d = 8
    state = init_track_state(2, d)
    ea = unit(np.ones(d))
    box = np.asarray(BOX_A, np.float32)
    for i in range(5):
        moved = box + i * 5  # 5px/frame shift, large IoU overlap
        b, v, e = det_inputs([moved], [True], [ea], d=d)
        state, _ = track_step(state, b, v, e)
    assert int(state.active.sum()) == 1
    assert int(state.processed[0]) == 4


def test_track_timeline_equals_stepwise():
    rng = np.random.default_rng(0)
    f, k, d, t = 12, 3, 8, 2
    boxes = np.zeros((f, k, 4), np.float32)
    valid = np.zeros((f, k), bool)
    embs = np.zeros((f, k, d), np.float32)
    for i in range(f):
        boxes[i, 0] = BOX_A
        valid[i, 0] = True
        embs[i, 0] = unit(np.ones(d) + rng.normal(size=d) * 0.5)
    state0 = init_track_state(t, d)
    st_scan, outs = track_timeline(
        state0, jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(embs),
        jnp.int32(f),
    )
    st_step = state0
    for i in range(f):
        st_step, _ = track_step(
            st_step, jnp.asarray(boxes[i]), jnp.asarray(valid[i]),
            jnp.asarray(embs[i]),
        )
    for a, b in zip(st_scan, st_step):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_track_timeline_padding_inert():
    rng = np.random.default_rng(1)
    f, k, d, t = 8, 2, 8, 2
    boxes = np.tile(np.asarray(BOX_A, np.float32), (f, k, 1))
    valid = np.ones((f, k), bool)
    embs = rng.normal(size=(f, k, d)).astype(np.float32)
    state0 = init_track_state(t, d)
    st_full, _ = track_timeline(
        state0, jnp.asarray(boxes[:5]), jnp.asarray(valid[:5]),
        jnp.asarray(embs[:5]), jnp.int32(5),
    )
    st_padded, _ = track_timeline(
        state0, jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(embs),
        jnp.int32(5),
    )
    for a, b in zip(st_full, st_padded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detector_analyze_frames_tracks_smoke():
    """Integration: multi-face path runs end to end and aggregates."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    cfg = DetectorConfig(
        frame_batch=4, max_tracks=2, compute_dtype="float32",
        mtcnn=MTCNNConfig(
            pnet_topk_total=16,
            rnet_capacity=8, onet_capacity=4,
            thresholds=(0.5, 0.3, 0.2),
        ),
    )
    det = Detector(cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(10, 64, 96, 3), dtype=np.uint8)
    agg, per_track, state = det.analyze_frames_tracks(frames, fps=10)
    assert 0 <= agg <= 100
    assert per_track.shape == (2,)
    assert agg == per_track.max(initial=0)


def test_analyze_video_multiface_smoke(tmp_path):
    import cv2
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    path = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(10):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8), (9, 9)))
    writer.release()

    cfg = DetectorConfig(
        frame_batch=4, max_tracks=2, compute_dtype="float32",
        mtcnn=MTCNNConfig(
            pnet_topk_total=16,
            rnet_capacity=8, onet_capacity=4, thresholds=(0.5, 0.3, 0.2),
        ),
    )
    det = Detector(cfg)
    out = str(tmp_path / "out.mp4")
    agg, per_track, _ = det.analyze_video_multiface(path, out)
    assert 0 <= agg <= 100
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10


def test_draw_landmarks_overlay():
    from truely_tpu.media.overlay import draw_landmarks

    frame = np.zeros((50, 60, 3), np.uint8)
    pts = np.array([[10.0, 10.0], [59.0, 49.0], [-5.0, 5.0], [100.0, 100.0]])
    draw_landmarks(frame, pts)
    assert frame[10, 10].any() and frame[49, 59].any()


def test_track_scores_aggregate():
    state = init_track_state(3, 4)
    state = state._replace(
        flagged_count=jnp.asarray([5, 0, 0], jnp.int32),
        final_counter=jnp.asarray([16, 0, 0], jnp.int32),
        processed=jnp.asarray([10, 10, 0], jnp.int32),
    )
    scores = np.asarray(track_scores(state, jnp.int32(964), jnp.int32(30)))
    assert scores[0] > 0
    assert scores[1] == 0   # processed but never flagged
    assert scores[2] == 0   # never processed
