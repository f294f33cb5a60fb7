"""Multi-stream scheduler tests: interleaved streams must score exactly as
if each were analyzed alone (the carried per-stream scan state is exact)."""

import numpy as np
import pytest

from truely_tpu.config import DetectorConfig, MTCNNConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.streaming import StreamScheduler


@pytest.fixture(scope="module")
def detector():
    cfg = DetectorConfig(
        frame_batch=8,
        mtcnn=MTCNNConfig(
            pnet_topk_total=32,
            rnet_capacity=8, onet_capacity=4,
            thresholds=(0.5, 0.3, 0.2),
        ),
        compute_dtype="float32",
    )
    return Detector(cfg)


def make_stream(seed, n=24, h=64, w=96):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_streams_match_solo_analysis(detector):
    fps = 10  # interval 1 -> every frame sampled
    streams = [make_stream(0), make_stream(1)]

    solo = [detector.analyze_frames(s, fps=fps) for s in streams]

    sched = StreamScheduler(detector, n_streams=2, frames_per_stream=4, fps=fps)
    events = []
    for t in range(streams[0].shape[0]):
        for i, s in enumerate(streams):
            sched.push(i, s[t])
        if sched.pending() >= 8:
            events.extend(sched.step())
    events.extend(sched.drain())

    by_stream = {0: [], 1: []}
    for e in events:
        by_stream[e.stream_id].append(e)
    for i in range(2):
        by_stream[i].sort(key=lambda e: e.frame_index)
        solo_recs = solo[i].records
        assert len(by_stream[i]) == len(solo_recs)
        for ev, rec in zip(by_stream[i], solo_recs):
            assert ev.frame_index == rec.frame_index
            assert ev.has_face == rec.has_face
            assert ev.flagged == rec.flagged
            assert ev.counter == rec.counter
        assert sched.stats[i].processed == solo[i].total_processed
        assert sched.stats[i].flagged_count == solo[i].flagged_count
        assert sched.score(i) == solo[i].fake_score


def test_sampling_in_scheduler(detector):
    sched = StreamScheduler(detector, n_streams=1, frames_per_stream=4, fps=30)
    assert sched.sample_interval == 4
    frames = make_stream(2, n=12)
    for t in range(12):
        sched.push(0, frames[t])
    assert sched.pending() == 3  # frames 0, 4, 8
    events = sched.drain()
    assert [e.frame_index for e in events] == [0, 4, 8]


def test_unbalanced_streams(detector):
    """A stream with no pending frames must not corrupt the others."""
    fps = 10
    s0 = make_stream(3, n=10)
    sched = StreamScheduler(detector, n_streams=3, frames_per_stream=4, fps=fps)
    for t in range(10):
        sched.push(0, s0[t])
    events = sched.drain()
    assert all(e.stream_id == 0 for e in events)
    assert len(events) == 10
    solo = detector.analyze_frames(s0, fps=fps)
    assert sched.score(0) == solo.fake_score
    assert sched.score(1) == 0


def test_step_with_nothing_queued(detector):
    sched = StreamScheduler(detector, n_streams=2, fps=30)
    assert sched.step() == []


def test_mesh_sharded_streams_match_unsharded(detector):
    """mesh= shards the packed batch's frame axis over a data mesh
    (BASELINE config 5's v5e-4 shape); events and scores must be exactly
    the single-device ones."""
    import jax

    from truely_tpu.parallel.mesh import make_mesh

    fps = 10
    streams = [make_stream(7), make_stream(8)]
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])

    def run(mesh_arg):
        sched = StreamScheduler(
            detector, n_streams=2, frames_per_stream=4, fps=fps,
            mesh=mesh_arg,
        )
        events = []
        for t in range(streams[0].shape[0]):
            for i, s in enumerate(streams):
                sched.push(i, s[t])
            if sched.pending() >= 8:
                events.extend(sched.step())
        events.extend(sched.drain())
        return events, [sched.score(i) for i in range(2)]

    ev_solo, sc_solo = run(None)
    ev_mesh, sc_mesh = run(mesh)
    assert sc_mesh == sc_solo
    assert len(ev_mesh) == len(ev_solo)
    for a, b in zip(ev_mesh, ev_solo):
        assert (a.stream_id, a.frame_index, a.has_face, a.flagged,
                a.counter) == (b.stream_id, b.frame_index, b.has_face,
                               b.flagged, b.counter)


def test_mesh_divisibility_error(detector):
    import jax

    from truely_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divisible"):
        StreamScheduler(detector, n_streams=3, frames_per_stream=2, mesh=mesh)


def test_reset_stream_recycles_slot_exactly(detector):
    """After reset_stream, a new stream in the slot must score exactly as
    if analyzed alone — no queued frames, counters, or stats leak from the
    slot's previous occupant."""
    fps = 10
    first = make_stream(20, n=16)
    second = make_stream(21, n=16)

    sched = StreamScheduler(detector, n_streams=2, frames_per_stream=4,
                            fps=fps)
    for t in range(16):
        sched.push(0, first[t])
    sched.drain()
    assert sched.stats[0].processed == 16

    sched.push(0, first[0])          # queued but never processed
    sched.reset_stream(0)
    assert sched.pending() == 0
    assert sched.stats[0].processed == 0
    assert sched.stream_counter(0) == 0

    for t in range(16):
        sched.push(0, second[t])
    sched.drain()
    solo = detector.analyze_frames(second, fps=fps)
    assert sched.score(0) == solo.fake_score
    assert sched.stats[0].processed == solo.total_processed
    assert sched.stats[0].flagged_count == solo.flagged_count


def test_scheduler_defaults_to_detectors_mesh(detector):
    """A mesh-constructed Detector's step only accepts sharded batches;
    the scheduler must inherit that mesh when none is passed (otherwise
    the unsharded path feeds an in_shardings jit and breaks)."""
    import jax

    from truely_tpu.parallel.mesh import make_mesh
    from truely_tpu.pipeline.detector import Detector

    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    det = Detector(detector.config, mesh=mesh)
    sched = StreamScheduler(det, n_streams=2, frames_per_stream=4, fps=10)
    assert sched._mesh is mesh
    stream = make_stream(30, n=8)
    for t in range(8):
        sched.push(0, stream[t])
    events = sched.drain()
    assert len(events) == 8
    solo = detector.analyze_frames(stream, fps=10)
    assert sched.score(0) == solo.fake_score


def test_mesh_sharded_yuv_streams_match_bgr(detector):
    """yuv=True over a data mesh: packed-I420 batches shard over chips,
    the exact conversion runs shard-local, and events/scores equal the
    unsharded BGR feed (the full product ingestion, sharded)."""
    import jax

    from truely_tpu.ops.yuv import i420_to_bgr
    from truely_tpu.parallel.mesh import make_mesh

    fps = 10
    h, w = 64, 96
    rng = np.random.default_rng(42)
    # packed I420 stream + its exact BGR rendering (same pixels on device)
    packed = rng.integers(0, 256, size=(16, h * 3 // 2, w), dtype=np.uint8)
    bgr = np.asarray(i420_to_bgr(packed))
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])

    def run(frames, yuv, mesh_arg):
        sched = StreamScheduler(
            detector, n_streams=2, frames_per_stream=4, fps=fps,
            mesh=mesh_arg, yuv=yuv,
        )
        events = []
        for t in range(frames.shape[0]):
            for i in range(2):
                sched.push(i, frames[t])
            if sched.pending() >= 8:
                events.extend(sched.step())
        events.extend(sched.drain())
        return events, [sched.score(i) for i in range(2)]

    ev_yuv, sc_yuv = run(packed, True, mesh)
    ev_bgr, sc_bgr = run(bgr, False, None)
    assert sc_yuv == sc_bgr
    assert len(ev_yuv) == len(ev_bgr)
    for a, b in zip(ev_yuv, ev_bgr):
        assert (a.stream_id, a.frame_index, a.has_face, a.flagged,
                a.counter, a.box) == (b.stream_id, b.frame_index,
                                      b.has_face, b.flagged, b.counter,
                                      b.box)


def test_1080p_yuv_mesh_streams_match_solo():
    """BASELINE config 5 at its actual bucket: 1080p60 streams, packed
    I420, DP-sharded over a virtual 4-device mesh — every event and score
    must equal solo analysis of the exact BGR rendering of the same pixels
    (the scheduler's interleaving-exactness property at the spec'd
    resolution, not a miniature stand-in)."""
    import jax

    from truely_tpu.ops.yuv import i420_to_bgr
    from truely_tpu.parallel.mesh import make_mesh

    cfg = DetectorConfig(
        frame_batch=8,
        mtcnn=MTCNNConfig(
            pnet_topk_total=32, rnet_capacity=8, onet_capacity=4,
            thresholds=(0.5, 0.3, 0.2),
        ),
        compute_dtype="float32",
    )
    det = Detector(cfg)
    h, w = 1080, 1920
    fps = 60  # sampling interval 8 — the 1080p60 law
    rng = np.random.default_rng(3)
    packed = [
        rng.integers(0, 256, size=(24, h * 3 // 2, w), dtype=np.uint8)
        for _ in range(2)
    ]
    bgr = [np.asarray(i420_to_bgr(p)) for p in packed]
    solo = [det.analyze_frames(b, fps=fps) for b in bgr]

    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    sched = StreamScheduler(
        det, n_streams=2, frames_per_stream=4, fps=fps, mesh=mesh, yuv=True
    )
    events = []
    for t in range(24):
        for i in range(2):
            sched.push(i, packed[i][t])
    events.extend(sched.drain())

    by_stream = {0: [], 1: []}
    for e in events:
        by_stream[e.stream_id].append(e)
    for i in range(2):
        by_stream[i].sort(key=lambda e: e.frame_index)
        solo_recs = solo[i].records
        assert len(by_stream[i]) == len(solo_recs) == 3  # frames 0, 8, 16
        for ev, rec in zip(by_stream[i], solo_recs):
            assert ev.frame_index == rec.frame_index
            assert ev.has_face == rec.has_face
            assert ev.flagged == rec.flagged
            assert ev.counter == rec.counter
            assert ev.box == rec.box
        assert sched.score(i) == solo[i].fake_score


# ---------------------------------------------------------------------------
# Track-propagated streaming (detect_interval=K > 1): full cascade every
# K-th scheduler STEP, per-stream seeded refinement between (the detector's
# propagate lever extended to the streaming surface).


def test_stream_propagate_keyframe_rows_match_full_mode(detector):
    """The first step is always a keyframe (no seeds yet), and its rows are
    bit-identical to full-detection mode — same frames, same temporal
    prefix, so has_face/box/counter all match."""
    frames = make_stream(11, n=8)

    def run(k):
        sched = StreamScheduler(
            detector, n_streams=1, frames_per_stream=4, fps=10,
            detect_interval=k,
        )
        evs = []
        for t in range(8):
            sched.push(0, frames[t])
            if sched.pending() >= 4:
                evs.extend(sched.step())
        evs.extend(sched.drain())
        return sched, evs

    s1, e1 = run(1)
    s2, e2 = run(2)
    assert s1.keyframe_steps == 0       # counter engages only at K>1
    assert s2.keyframe_steps >= 1
    assert [e.frame_index for e in e1] == [e.frame_index for e in e2]
    for a, b in zip(e1[:4], e2[:4]):    # step 0 rows: keyframe in both
        assert (a.has_face, a.box, a.counter) == (b.has_face, b.box,
                                                  b.counter)


def test_stream_propagate_cadence_promotion_and_reset(detector):
    """Cadence contract: a step with no valid seeds is promoted to a
    keyframe; with seeds planted, refines run until the interval expires;
    reset_stream drops the slot's seed."""
    sched = StreamScheduler(
        detector, n_streams=2, frames_per_stream=2, fps=10,
        detect_interval=3,
    )
    frames = make_stream(12, n=12)

    def push_and_step(t0):
        for t in range(t0, t0 + 2):
            for i in range(2):
                sched.push(i, frames[t])
        sched.step()

    push_and_step(0)                    # no seeds -> promoted keyframe
    assert (sched.steps_run, sched.keyframe_steps) == (1, 1)

    def plant():
        sched._seed_box[:] = np.array([10.0, 8.0, 50.0, 40.0], np.float32)
        sched._seed_valid[:] = True

    plant(); push_and_step(2)           # since_kf 1 -> refine
    plant(); push_and_step(4)           # since_kf 2 -> refine
    assert (sched.steps_run, sched.keyframe_steps) == (3, 1)
    plant(); push_and_step(6)           # since_kf 3 >= K -> keyframe
    assert (sched.steps_run, sched.keyframe_steps) == (4, 2)

    # reset of ONE stream keeps the other's seed -> no promotion
    plant()
    sched.reset_stream(0)
    assert not sched._seed_valid[0] and sched._seed_valid[1]
    push_and_step(8)                    # since_kf 1, stream 1 seeded -> refine
    assert sched.keyframe_steps == 2
    # dropping every seed promotes the next step
    sched._seed_valid[:] = False
    push_and_step(10)
    assert sched.keyframe_steps == 3


def test_stream_propagate_mesh_smoke(detector):
    """The propagate path composes with a data mesh: keyframe and refine
    steps both execute sharded and emit the full event set."""
    import jax

    from truely_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    sched = StreamScheduler(
        detector, n_streams=2, frames_per_stream=2, fps=10,
        mesh=mesh, detect_interval=2,
    )
    frames = make_stream(13, n=8)
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
