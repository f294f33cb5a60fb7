"""Offline batch analysis: concurrent multi-video == per-video solo runs."""

import numpy as np
import pytest
import cv2

from truely_tpu.config import DetectorConfig, MTCNNConfig
from truely_tpu.pipeline.batch import analyze_videos
from truely_tpu.pipeline.detector import Detector


@pytest.fixture(scope="module")
def detector():
    cfg = DetectorConfig(
        frame_batch=8, compute_dtype="float32",
        mtcnn=MTCNNConfig(
            pnet_topk_total=16,
            rnet_capacity=8, onet_capacity=4, thresholds=(0.5, 0.3, 0.2),
        ),
    )
    return Detector(cfg)


def write_video(path, seed, n=14, fps=10, w=96, h=64):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(seed)
    for _ in range(n):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8), (9, 9)))
    writer.release()
    return path


def test_batch_matches_solo(tmp_path, detector):
    paths = [
        write_video(str(tmp_path / f"v{i}.mp4"), seed=i, n=12 + 3 * i)
        for i in range(3)
    ]
    results = analyze_videos(detector, paths, frames_per_video=3)
    assert [r.path for r in results] == paths
    for r, p in zip(results, paths):
        solo = detector.analyze_video(p)
        assert r.fake_score == solo.fake_score, p
        assert r.total_processed == solo.total_processed
        assert r.flagged_count == solo.flagged_count
        assert r.suspicious_frames == solo.suspicious_frames
        assert r.frame_count == solo.frame_count


def test_batch_rejects_mixed_resolutions(tmp_path, detector):
    a = write_video(str(tmp_path / "a.mp4"), 0, w=96, h=64)
    b = write_video(str(tmp_path / "b.mp4"), 1, w=64, h=48)
    with pytest.raises(ValueError, match="equal resolutions"):
        analyze_videos(detector, [a, b])


def test_batch_mesh_matches_unsharded(tmp_path, detector):
    """mesh= forwards to the scheduler: per-video results must be exactly
    the single-device ones."""
    import jax

    from truely_tpu.parallel.mesh import make_mesh

    paths = [
        write_video(str(tmp_path / f"m{i}.mp4"), seed=10 + i, n=10 + 2 * i)
        for i in range(2)
    ]
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    solo = analyze_videos(detector, paths, frames_per_video=2)
    sharded = analyze_videos(detector, paths, frames_per_video=2, mesh=mesh)
    for a, b in zip(solo, sharded):
        assert (a.fake_score, a.total_processed, a.flagged_count,
                a.suspicious_frames) == (b.fake_score, b.total_processed,
                                         b.flagged_count, b.suspicious_frames)
