"""The streaming product surface (BASELINE config 5, VERDICT r2 task 3):
``stream_videos`` / ``truely_tpu stream`` drive N concurrent files through
shared device batches and must reproduce solo-analysis results exactly."""

import json

import numpy as np
import cv2
import pytest

from truely_tpu.cli import main
from truely_tpu.config import DetectorConfig, MTCNNConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.stream_files import stream_videos


@pytest.fixture(scope="module")
def detector():
    cfg = DetectorConfig(
        frame_batch=8,
        mtcnn=MTCNNConfig(
            pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
            thresholds=(0.5, 0.3, 0.2),
        ),
        compute_dtype="float32",
    )
    return Detector(cfg)


def synth_clip(path, seed, n=10, w=96, h=64, fps=10):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(seed)
    for _ in range(n):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8), (9, 9)))
    writer.release()
    return path


def test_stream_matches_solo_analysis(tmp_path, detector):
    """Per-stream events and scores == analyzing each video alone."""
    paths = [synth_clip(str(tmp_path / f"v{i}.mp4"), seed=i) for i in range(3)]
    events = []
    summaries = stream_videos(
        detector, paths, frames_per_stream=2, on_event=events.append
    )
    solos = [detector.analyze_video(p) for p in paths]
    for s, solo in zip(summaries, solos):
        assert s.fake_score == solo.fake_score
        assert s.frame_count == solo.frame_count
        assert s.processed == solo.total_processed
        assert s.flagged_count == solo.flagged_count
        assert s.suspicious_frames == solo.suspicious_frames
        assert s.wall_s > 0 and s.sampled_fps > 0
    # every sampled frame produced exactly one event
    assert len(events) == sum(s.processed for s in summaries)
    # lag stats populated (every event had a matching push)
    assert all(s.max_lag_s >= s.mean_lag_s >= 0 for s in summaries)


def test_stream_yuv_and_bgr_agree(tmp_path, detector):
    paths = [synth_clip(str(tmp_path / f"y{i}.mp4"), seed=10 + i)
             for i in range(2)]
    a = stream_videos(detector, paths, frames_per_stream=2, yuv=True)
    b = stream_videos(detector, paths, frames_per_stream=2, yuv=False)
    for sa, sb in zip(a, b):
        assert sa.fake_score == sb.fake_score
        assert sa.suspicious_frames == sb.suspicious_frames
        assert sa.processed == sb.processed
    try:
        from truely_tpu.media import videodec  # noqa: F401

        assert a[0].yuv_ingest  # extension built -> the fast path engaged
    except ImportError:
        assert not a[0].yuv_ingest


def test_stream_realtime_paces_and_completes(tmp_path, detector):
    paths = [synth_clip(str(tmp_path / "rt.mp4"), seed=3, n=6, fps=30)]
    summaries = stream_videos(detector, paths, realtime=True)
    assert summaries[0].frame_count == 6
    assert summaries[0].processed == 2  # fps 30 -> interval 4 -> frames 0,4
    # paced at 30 fps, 6 frames take >= ~0.16 s
    assert summaries[0].wall_s >= 0.1


def test_stream_rejects_mixed_resolutions(tmp_path, detector):
    a = synth_clip(str(tmp_path / "a.mp4"), seed=1, w=96, h=64)
    b = synth_clip(str(tmp_path / "b.mp4"), seed=2, w=64, h=48)
    with pytest.raises(ValueError, match="equal resolutions"):
        stream_videos(detector, [a, b])


def test_stream_cli(tmp_path, capsys):
    paths = [synth_clip(str(tmp_path / f"c{i}.mp4"), seed=20 + i, n=8)
             for i in range(2)]
    rc = main(["stream", *paths, "--batch", "4", "--events", "--compact"])
    assert rc == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out_lines[-1])
    assert len(payload) == 2
    for entry in payload:
        assert entry["frameCount"] == 8
        assert 0 <= entry["fakeScore"] <= 100
        assert "sampledFps" in entry and "meanLagMs" in entry
    # --events emitted one JSONL line per sampled frame before the summary
    n_events = sum(e["processedFrames"] for e in payload)
    event_lines = [json.loads(x) for x in out_lines[:-1]]
    assert len(event_lines) == n_events
    assert {e["stream"] for e in event_lines} == {0, 1}


def test_stream_cli_unreadable_input(capsys):
    rc = main(["stream", "/nonexistent/clip.mp4"])
    assert rc == 1
    assert "error: could not open video" in capsys.readouterr().err


def test_stream_lag_percentiles_and_efficiency(tmp_path, detector):
    """Lag distribution stats (BASELINE config 5 asks for sustained lag,
    not just the mean) plus scheduler batch-efficiency counters."""
    path = synth_clip(str(tmp_path / "pq.mp4"), seed=5, n=12)
    eff: dict = {}
    s = stream_videos(detector, [path], frames_per_stream=2,
                      scheduler_stats=eff)[0]
    assert s.processed > 1  # enough events for a distribution
    assert 0 <= s.p50_lag_s <= s.p95_lag_s <= s.max_lag_s
    # every scored frame is accounted for, padding is the complement
    assert eff["frames_scored"] == s.processed
    assert eff["frames_padded"] == eff["steps"] * 2 - s.processed
    assert 0 < eff["batch_utilization"] <= 1


def test_stream_partial_step_budget_batches(tmp_path, detector):
    """With a large partial-step budget, the realtime loop accumulates a
    full batch instead of stepping each frame alone; with budget 0 it
    partial-steps on paced-idle gaps.  Results are identical either way —
    the budget only trades latency for batch utilization."""
    path = synth_clip(str(tmp_path / "pb.mp4"), seed=11, n=6, fps=30)
    eager: dict = {}
    s0 = stream_videos(detector, [path], frames_per_stream=2,
                       realtime=True, scheduler_stats=eager)[0]
    path2 = synth_clip(str(tmp_path / "pb2.mp4"), seed=11, n=6, fps=30)
    lazy: dict = {}
    s1 = stream_videos(detector, [path2], frames_per_stream=2,
                       realtime=True, partial_step_budget=1e9,
                       scheduler_stats=lazy)[0]
    # same content -> same decisions regardless of batching policy
    assert (s0.fake_score, s0.processed, s0.suspicious_frames) == (
        s1.fake_score, s1.processed, s1.suspicious_frames)
    # the budget strictly improves utilization (2 sampled frames fit one
    # 2-frame batch; eager mode steps frame 0 alone on the first idle gap)
    assert lazy["steps"] <= eager["steps"]
    assert lazy["batch_utilization"] >= eager["batch_utilization"]
    assert lazy["steps"] == 1 and lazy["batch_utilization"] == 1.0


def test_stream_cli_sample_hz(tmp_path, capsys):
    """--sample-hz rescales the sampling law: at 30 fps, the default 7 Hz
    samples every 4th frame, 15 Hz every 2nd."""
    path = synth_clip(str(tmp_path / "hz.mp4"), seed=9, n=8, fps=30)
    rc = main(["stream", path, "--batch", "4", "--compact",
               "--sample-hz", "15"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload[0]["processedFrames"] == 4  # frames 0,2,4,6
    assert "p50LagMs" in payload[0] and "p95LagMs" in payload[0]


# ---------------------------------------------------------------------------
# Multi-face streaming (configs 4 x 5 composed): per-stream per-track
# results must equal solo analyze_video_multiface exactly.


@pytest.fixture(scope="module")
def mf_detector():
    cfg = DetectorConfig(
        frame_batch=8, multi_face=True, max_tracks=3,
        mtcnn=MTCNNConfig(
            pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
            thresholds=(0.5, 0.3, 0.2),
        ),
        compute_dtype="float32",
    )
    return Detector(cfg)


def test_stream_multiface_matches_solo(tmp_path, mf_detector):
    """Concurrent multi-face streams: per-track scores and the aggregate
    equal each video's solo analyze_video_multiface (the VERDICT r4
    exactness contract for the configs-4x5 composition)."""
    paths = [synth_clip(str(tmp_path / f"mf{i}.mp4"), seed=40 + i, n=16)
             for i in range(2)]
    solos = [mf_detector.analyze_video_multiface(p) for p in paths]
    events = []
    summaries = stream_videos(
        mf_detector, paths, frames_per_stream=4, on_event=events.append
    )
    for s, (solo_score, solo_tracks, _) in zip(summaries, solos):
        assert s.fake_score == solo_score
        assert s.track_scores == [int(v) for v in solo_tracks]
    assert len(events) == sum(s.processed for s in summaries)
    assert all(hasattr(e, "track_boxes") for e in events)


def test_batch_annotated_multiface(tmp_path, mf_detector):
    """analyze_videos_annotated with a multi-face detector: shared device
    batches, per-track scores in the results, non-empty annotated outputs
    (per-track red/green re-render)."""
    from truely_tpu.pipeline.batch import analyze_videos_annotated

    paths = [synth_clip(str(tmp_path / f"ma{i}.mp4"), seed=50 + i, n=16)
             for i in range(2)]
    outs = [str(tmp_path / f"ma{i}_out.mp4") for i in range(2)]
    solos = [mf_detector.analyze_video_multiface(p) for p in paths]
    results = analyze_videos_annotated(mf_detector, paths, outs)
    import os

    for r, o, (solo_score, solo_tracks, _) in zip(results, outs, solos):
        assert r.fake_score == solo_score
        assert r.track_scores == [int(v) for v in solo_tracks]
        assert r.output_path == o
        assert os.path.getsize(o) > 0


def test_stream_cli_multiface(tmp_path, capsys):
    paths = [synth_clip(str(tmp_path / f"mc{i}.mp4"), seed=60 + i, n=8)
             for i in range(2)]
    rc = main(["stream", *paths, "--batch", "4", "--events", "--compact",
               "--multi-face"])
    assert rc == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out_lines[-1])
    assert len(payload) == 2
    for entry in payload:
        assert "trackScores" in entry
        assert entry["fakeScore"] == max(entry["trackScores"], default=0)
    event_lines = [json.loads(x) for x in out_lines[:-1]]
    assert len(event_lines) == sum(e["processedFrames"] for e in payload)
    assert all("tracks" in e for e in event_lines)
