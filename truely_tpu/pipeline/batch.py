"""Offline batch analysis: many videos through shared device batches
(BASELINE config 3: "32x 1080p videos, full-batch MTCNN pyramid + FaceNet
embeddings resident in HBM").

Each video is treated as a stream in the multi-stream scheduler: decode
threads fill per-video queues, every device step packs frames from all
videos into one batch, and per-video temporal states keep scoring exact
(StreamScheduler's interleaving == solo-analysis equivalence is tested).
The reference processes videos strictly one at a time (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence


@dataclass
class BatchVideoResult:
    path: str
    fake_score: int
    frame_count: int
    fps: int
    total_processed: int
    flagged_count: int
    suspicious_frames: List[int]


def analyze_videos(
    detector,
    paths: Sequence[str],
    *,
    frames_per_video: Optional[int] = None,
    mesh=None,
) -> List[BatchVideoResult]:
    """Analyze a batch of same-resolution videos concurrently on one chip
    — or across a slice: ``mesh`` is forwarded to the scheduler, which
    DP-shards every packed batch over the mesh's data axis.

    All videos must share width/height (one compiled resolution bucket);
    fps may differ per video (per-video sampling intervals).  Delegates to
    the live-stream driver (pipeline/stream_files.py) at full decode
    speed, so batches ingest native YUV when eligible and the per-video
    results are exactly the solo ``analyze_video`` ones (tested)."""
    from truely_tpu.pipeline.stream_files import stream_videos

    summaries = stream_videos(
        detector, paths, frames_per_stream=frames_per_video, mesh=mesh
    )
    return [
        BatchVideoResult(
            path=s.path,
            fake_score=s.fake_score,
            frame_count=s.frame_count,
            fps=s.fps,
            total_processed=s.processed,
            flagged_count=s.flagged_count,
            suspicious_frames=s.suspicious_frames,
        )
        for s in summaries
    ]
