"""Multi-face streaming (BASELINE configs 4 x 5 composed): the
StreamScheduler's ``multi_face`` mode must give every concurrent stream
exactly the per-track decisions and scores it would get from a solo
``analyze_frames_tracks`` / ``analyze_video_multiface`` run.

The reference supports neither half: it keeps only ``boxes[0]``
(/root/reference/server/model.py:49) and analyzes one video at a time
(server/server.py:611)."""

import cv2
import numpy as np
import pytest
import jax

from truely_tpu.config import DetectorConfig, MTCNNConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.streaming import MultiFaceStreamEvent, StreamScheduler

# Random weights need permissive thresholds + small capacities to detect.
MT = dict(
    multi_face=True,
    max_tracks=3,
    mtcnn=MTCNNConfig(
        pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
        thresholds=(0.5, 0.3, 0.2),
    ),
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def detector():
    return Detector(DetectorConfig(frame_batch=8, **MT))


def blurred_stream(seed, n=24, h=64, w=96):
    rng = np.random.default_rng(seed)
    return np.stack([
        cv2.blur(rng.integers(0, 256, (h, w, 3), np.uint8), (9, 9))
        for _ in range(n)
    ])


def _state_tuple(state):
    return jax.tree_util.tree_map(np.asarray, tuple(state))


def test_multiface_streams_match_solo(detector):
    """Interleaved multi-face streams score per-track exactly as solo
    analysis; final TrackStates are bit-identical."""
    fps = 10
    streams = [blurred_stream(0), blurred_stream(1)]
    solo = [detector.analyze_frames_tracks(s, fps=fps) for s in streams]
    # The fixture must be non-vacuous: some track actually accumulated
    # consecutive-frame updates on this content.
    assert any(np.asarray(st.processed).sum() > 0 for _, _, st in solo)

    sched = StreamScheduler(
        detector, n_streams=2, frames_per_stream=4, fps=fps, multi_face=True
    )
    events = []
    for t in range(streams[0].shape[0]):
        for i, s in enumerate(streams):
            sched.push(i, s[t])
        if sched.pending() >= 8:
            events.extend(sched.step())
    events.extend(sched.drain())

    assert all(isinstance(e, MultiFaceStreamEvent) for e in events)
    assert len(events) == 48
    for i in range(2):
        solo_score, solo_tracks, solo_state = solo[i]
        assert sched.score(i) == solo_score
        assert np.array_equal(sched.track_scores_for(i), solo_tracks)
        state_i = jax.tree_util.tree_map(
            lambda x: np.asarray(x[i]), sched._states
        )
        for a, b in zip(tuple(state_i), _state_tuple(solo_state)):
            assert np.array_equal(a, b)


def test_multiface_mesh_matches_unsharded(detector):
    """multi_face over a 4-device data mesh: per-track events and scores
    equal the single-device run (decisions exact; see
    test_propagate_multiface for the float last-ULP contract)."""
    from truely_tpu.parallel.mesh import make_mesh

    fps = 10
    streams = [blurred_stream(7), blurred_stream(8)]
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])

    def run(mesh_arg):
        sched = StreamScheduler(
            detector, n_streams=2, frames_per_stream=4, fps=fps,
            mesh=mesh_arg, multi_face=True,
        )
        events = []
        for t in range(streams[0].shape[0]):
            for i, s in enumerate(streams):
                sched.push(i, s[t])
            if sched.pending() >= 8:
                events.extend(sched.step())
        events.extend(sched.drain())
        return sched, events

    s_solo, ev_solo = run(None)
    s_mesh, ev_mesh = run(mesh)
    for i in range(2):
        assert s_mesh.score(i) == s_solo.score(i)
        assert np.array_equal(
            s_mesh.track_scores_for(i), s_solo.track_scores_for(i)
        )
    assert len(ev_mesh) == len(ev_solo)
    for a, b in zip(ev_mesh, ev_solo):
        assert (a.stream_id, a.frame_index, a.track_updated,
                a.track_flagged) == (b.stream_id, b.frame_index,
                                     b.track_updated, b.track_flagged)


def test_multiface_defaults_from_detector_config(detector):
    """A multi_face-configured detector turns the mode on without the
    explicit flag (the serve path constructs schedulers this way)."""
    sched = StreamScheduler(detector, n_streams=1, frames_per_stream=4,
                            fps=10)
    assert sched.multi_face
    frames = blurred_stream(3, n=8)
    for t in range(8):
        sched.push(0, frames[t])
    events = sched.drain()
    assert len(events) == 8
    assert all(isinstance(e, MultiFaceStreamEvent) for e in events)
    solo_score, solo_tracks, _ = detector.analyze_frames_tracks(
        frames, fps=10
    )
    assert sched.score(0) == solo_score
    assert np.array_equal(sched.track_scores_for(0), solo_tracks)


def test_multiface_reset_stream_recycles_slot(detector):
    fps = 10
    first = blurred_stream(20, n=16)
    second = blurred_stream(21, n=16)
    sched = StreamScheduler(
        detector, n_streams=2, frames_per_stream=4, fps=fps, multi_face=True
    )
    for t in range(16):
        sched.push(0, first[t])
    sched.drain()
    assert sched.stats[0].processed == 16
    sched.reset_stream(0)
    assert sched.stats[0].processed == 0
    assert sched.stream_counter(0) == 0
    for t in range(16):
        sched.push(0, second[t])
    sched.drain()
    solo_score, solo_tracks, _ = detector.analyze_frames_tracks(
        second, fps=fps
    )
    assert sched.score(0) == solo_score
    assert np.array_equal(sched.track_scores_for(0), solo_tracks)


# ---------------------------------------------------------------------------
# Multi-face track-propagated streaming (detect_interval=K > 1): full
# multi-face cascade every K-th scheduler STEP, (S, T)-seeded refinement
# between (pipeline/mtcnn.refine_faces_multi behind
# detector._ensure_stream_mrefine_step).


def test_multiface_propagate_cadence_and_seeds(detector):
    sched = StreamScheduler(
        detector, n_streams=2, frames_per_stream=4, fps=10,
        multi_face=True, detect_interval=2,
    )
    assert sched._seed_box.shape == (2, 3, 4)
    assert sched._seed_valid.shape == (2, 3)
    streams = [blurred_stream(30), blurred_stream(31)]
    events = []
    for t in range(24):
        for i, s in enumerate(streams):
            sched.push(i, s[t])
        if sched.pending() >= 8:
            events.extend(sched.step())
    events.extend(sched.drain())
    assert len(events) == 48
    assert sched.keyframe_steps >= 1
    # on detecting content the seeds roll forward and refines actually run
    if sched._seed_valid.any():
        assert sched.steps_run > sched.keyframe_steps


def test_multiface_propagate_first_step_matches_full(detector):
    """Step 0 is always a keyframe (no seeds yet): its per-track events are
    bit-identical to detect_interval=1 mode."""
    frames = blurred_stream(40, n=4)

    def run(k):
        sched = StreamScheduler(
            detector, n_streams=1, frames_per_stream=4, fps=10,
            multi_face=True, detect_interval=k,
        )
        for t in range(4):
            sched.push(0, frames[t])
        return sched.drain()

    e1, e2 = run(1), run(2)
    assert len(e1) == len(e2) == 4
    for a, b in zip(e1, e2):
        assert a.track_boxes == b.track_boxes
        assert a.track_updated == b.track_updated
        assert a.track_flagged == b.track_flagged


def test_multiface_propagate_mesh_smoke(detector):
    from truely_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    sched = StreamScheduler(
        detector, n_streams=2, frames_per_stream=2, fps=10,
        mesh=mesh, multi_face=True, detect_interval=2,
    )
    frames = blurred_stream(50, n=8)
    events = []
    for t in range(4):
        for i in range(2):
            sched.push(i, frames[t])
        if sched.pending() >= 4:
            events.extend(sched.step())
        if t == 1:  # force one refine step regardless of content
            sched._seed_box[:] = np.array([10.0, 8.0, 50.0, 40.0],
                                          np.float32)
            sched._seed_valid[:] = True
    events.extend(sched.drain())
    assert len(events) == 8
    assert sched.keyframe_steps >= 1
    assert sched.steps_run > sched.keyframe_steps  # a refine really ran
