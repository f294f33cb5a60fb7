"""Adaptive keyframing (``detect_interval="auto"``, VERDICT r4 task 3).

Fixed K trades a hard <=(K-1)-sample blind spot for speed everywhere;
"auto" spends that budget only where the content earns it: the interval
ladders 1 -> 2 -> ... -> auto_interval_max while seeded refinement keeps
re-acquiring its seeds, and collapses back to per-segment full detection
on a majority loss (the propagate_fallback survivor test).  Every k>1
cycle is exactly the fixed-K macro-cycle, so rung-k drift is the fixed-K
drift the PERFORMANCE.md table pins — "auto" only chooses WHICH rung runs.
The reference re-detects from scratch on every sampled frame
(/root/reference/server/model.py:47)."""

import cv2
import numpy as np
import pytest

from truely_tpu.config import DetectorConfig, MTCNNConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.streaming import StreamScheduler

MT = dict(
    mtcnn=MTCNNConfig(
        pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
        thresholds=(0.5, 0.3, 0.2),
    ),
    compute_dtype="float32",
)


def blurred(seed, n, h=64, w=96):
    rng = np.random.default_rng(seed)
    return np.stack([
        cv2.blur(rng.integers(0, 256, (h, w, 3), np.uint8), (9, 9))
        for _ in range(n)
    ])


def flat_gray(n, h=64, w=96):
    """Featureless frames: nothing for the cascade to detect."""
    return np.full((n, h, w, 3), 128, np.uint8)


@pytest.fixture(scope="module")
def stable_frames():
    return blurred(0, 64)


def test_auto_escalates_on_stable_content(stable_frames):
    det = Detector(DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=4, **MT
    ))
    full = Detector(DetectorConfig(frame_batch=8, **MT))
    full.params = det.params
    res_full = full.analyze_frames(stable_frames, fps=10)
    res = det.analyze_frames(stable_frames, fps=10)
    # The ladder climbed: most segments ran the cheap refinement step.
    assert det.auto_interval_current > 1
    assert det.auto_refine_segments > det.auto_keyframe_segments
    # Same record shape; the first segment (rung 1 = a full-detection
    # step with the same temporal prefix) is bit-identical to full mode.
    assert len(res.records) == len(res_full.records) == 64
    for a, b in zip(res.records[:8], res_full.records[:8]):
        assert (a.frame_index, a.has_face, a.box, a.counter) == (
            b.frame_index, b.has_face, b.box, b.counter)


def test_auto_collapses_when_faces_vanish(stable_frames):
    det = Detector(DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=4, **MT
    ))
    frames = np.concatenate([stable_frames[:32], flat_gray(32)])
    det.analyze_frames(frames, fps=10)
    # The featureless tail kills every seed: the ladder must be back at
    # rung 1 by the end (and full detection ran on the tail segments).
    assert det.auto_interval_current == 1


def test_auto_never_exceeds_cap(stable_frames):
    det = Detector(DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=2, **MT
    ))
    det.analyze_frames(stable_frames, fps=10)
    assert det.auto_interval_current <= 2


def test_auto_validation():
    with pytest.raises(ValueError, match="divisible"):
        Detector(DetectorConfig(frame_batch=6, detect_interval="auto", **MT))
    with pytest.raises(ValueError, match="power of two"):
        Detector(DetectorConfig(
            frame_batch=6, detect_interval="auto", auto_interval_max=3, **MT
        ))
    with pytest.raises(ValueError, match="auto"):
        Detector(DetectorConfig(frame_batch=8, detect_interval="four", **MT))


def test_auto_multiface_escalates_and_matches_shape(stable_frames):
    """Multi-face auto (round 5): the ladder escalates on stable content
    with (row, track) slots as the survivor currency, and the aggregate /
    per-track outputs keep analyze_frames_tracks' contract.  The first
    segment (rung 1 = a full multi-face step) makes auto's track fold
    start from the same state as full mode."""
    det = Detector(DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=4,
        multi_face=True, **MT
    ))
    full = Detector(DetectorConfig(frame_batch=8, multi_face=True, **MT))
    full.params = det.params
    agg_f, per_f, _ = full.analyze_frames_tracks(stable_frames, fps=10)
    agg, per, state = det.analyze_frames_tracks(stable_frames, fps=10)
    assert det.auto_interval_current > 1
    assert det.auto_refine_segments > 0
    assert per.shape == per_f.shape
    assert int(np.asarray(state.processed).sum()) > 0


def test_auto_multiface_collapses_when_faces_vanish(stable_frames):
    det = Detector(DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=4,
        multi_face=True, **MT
    ))
    frames = np.concatenate([stable_frames[:32], flat_gray(32)])
    det.analyze_frames_tracks(frames, fps=10)
    assert det.auto_interval_current == 1


def test_auto_streaming_cadence(stable_frames):
    det = Detector(DetectorConfig(frame_batch=8, **MT))
    sched = StreamScheduler(
        det, n_streams=2, frames_per_stream=4, fps=10,
        detect_interval="auto",
    )
    assert sched.auto_interval and sched._cur_k == 1
    events = []
    for t in range(32):
        for i in range(2):
            sched.push(i, stable_frames[t])
        if sched.pending() >= 8:
            events.extend(sched.step())
    events.extend(sched.drain())
    assert len(events) == 64
    # On tracking content the rung climbed and refine steps actually ran.
    if sched._seed_valid.any():
        assert sched._cur_k > 1
        assert sched.steps_run > sched.keyframe_steps


def test_auto_streaming_multiface_degrades_to_full():
    """A MULTI-FACE scheduler handed "auto" (e.g. the serve group runner
    wrapping a multiface-auto detector) degrades to full detection every
    step — never an error mid-job; the solo analyze paths are where the
    multi-face ladder runs."""
    det = Detector(DetectorConfig(frame_batch=8, **MT))
    sched = StreamScheduler(det, n_streams=1, fps=10,
                            detect_interval="auto", multi_face=True)
    assert not sched.auto_interval
    assert sched.detect_interval == 1


def test_auto_cli_validation(tmp_path, capsys):
    from truely_tpu.cli import main

    rc = main(["analyze", "/nonexistent.mp4", "--detect-interval", "auto"])
    assert rc == 1  # fails on the missing file, after arg parsing passed
    clip = str(tmp_path / "c.mp4")
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    for f in blurred(1, 4):
        w.write(f)
    w.release()
    # auto's batch divisor is the interval cap (8): batch 6 must reject.
    rc = main(["analyze", clip, "--batch", "6",
               "--detect-interval", "auto"])
    assert rc == 1
    assert "divisible" in capsys.readouterr().err


def test_auto_mesh_matches_unsharded(stable_frames):
    """DP-sharded adaptive keyframing is exact vs single-device: the
    ladder's host-synced survivor stats come from the same step outputs,
    so the rung schedule and every record match (f32 fixture — the same
    exactness contract the fixed-K mesh tests pin)."""
    from truely_tpu.parallel.mesh import make_mesh
    import jax

    cfg = DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=4, **MT
    )
    solo = Detector(cfg)
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    sharded = Detector(cfg, mesh=mesh)
    sharded.params = jax.device_put(
        jax.device_get(solo.params), sharded._params_sharding
    )
    res_a = solo.analyze_frames(stable_frames, fps=10)
    res_b = sharded.analyze_frames(stable_frames, fps=10)
    assert res_b.fake_score == res_a.fake_score
    assert (sharded.auto_keyframe_segments, sharded.auto_refine_segments) \
        == (solo.auto_keyframe_segments, solo.auto_refine_segments)
    for a, b in zip(res_a.records, res_b.records):
        assert (a.frame_index, a.has_face, a.flagged, a.counter) == (
            b.frame_index, b.has_face, b.flagged, b.counter)
        np.testing.assert_allclose(a.box, b.box, rtol=1e-5, atol=1e-4)


def test_auto_multiface_mesh_matches_unsharded(stable_frames):
    """Multi-face auto on a DP mesh: same ladder schedule and per-track
    scores as single-device (round 5 — the sharded mdetect/mprop rung
    executables compose with the host-side ladder)."""
    from truely_tpu.parallel.mesh import make_mesh
    import jax

    cfg = DetectorConfig(
        frame_batch=8, detect_interval="auto", auto_interval_max=4,
        multi_face=True, **MT
    )
    solo = Detector(cfg)
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    sharded = Detector(cfg, mesh=mesh)
    sharded.params = jax.device_put(
        jax.device_get(solo.params), sharded._params_sharding
    )
    score_a, per_a, _ = solo.analyze_frames_tracks(stable_frames, fps=10)
    score_b, per_b, _ = sharded.analyze_frames_tracks(stable_frames, fps=10)
    assert score_b == score_a
    assert np.array_equal(per_a, per_b)
    assert (sharded.auto_keyframe_segments, sharded.auto_refine_segments) \
        == (solo.auto_keyframe_segments, solo.auto_refine_segments)
