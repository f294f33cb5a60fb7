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
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclass
class BatchVideoResult:
    path: str
    fake_score: int
    frame_count: int
    fps: int
    total_processed: int
    flagged_count: int
    suspicious_frames: List[int]
    output_path: Optional[str] = None
    # Multi-face mode only: per-track scores (fake_score = max over tracks).
    track_scores: Optional[List[int]] = None


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


def _event_drawn(e, flagged_only: bool) -> bool:
    """Whether this event gets any box drawn (same conditions the solo
    writers use, incl. the draw_mode="flagged-only" host-cost lever)."""
    if not e.annotated:
        return False
    return not flagged_only or e.flagged


def _draw_event(px, e, idx: int, rgb: bool, flagged_only: bool) -> None:
    """Draw one event's annotations: per-track boxes for multi-face events
    (same updated-track condition analyze_video_multiface draws under),
    the single box otherwise."""
    from truely_tpu.media.overlay import annotate_frame

    boxes = getattr(e, "track_boxes", None)
    if boxes is not None:
        for t, box in enumerate(boxes):
            if e.track_updated[t] and (
                not flagged_only or e.track_flagged[t]
            ):
                annotate_frame(
                    px, box, flagged=bool(e.track_flagged[t]),
                    frame_index=idx, rgb=rgb,
                )
    else:
        annotate_frame(px, e.box, flagged=e.flagged, frame_index=idx,
                       rgb=rgb)


def render_annotated(config, path: str, output_path: str, events) -> None:
    """Re-render one video with the red/green annotations implied by its
    stream events — single-face StreamEvent or per-track
    MultiFaceStreamEvent — (host-only: decode → draw on annotated sampled
    frames → encode; untouched frames pass through as I420 when eligible,
    exactly like Detector.analyze_video's writer path)."""
    from truely_tpu.media.decode import VideoReader
    from truely_tpu.media.encode import VideoWriter
    from truely_tpu.media.native import i420_to_bgr_host

    rgb = not config.reference_compat
    flagged_only = getattr(config, "draw_mode", "all") == "flagged-only"
    with VideoReader(
        path, rgb=rgb, yuv=config.yuv_ingest, host_frames=True
    ) as reader:
        meta = reader.meta
        with VideoWriter(
            output_path, meta.fps, meta.width, meta.height
        ) as writer:
            if reader.yuv_active:
                for idx, packed in reader.yuv_frames():
                    e = events.get(idx)
                    if e is None or not _event_drawn(e, flagged_only):
                        writer.write_i420(packed)
                        continue
                    px = i420_to_bgr_host(packed, rgb=rgb)
                    _draw_event(px, e, idx, rgb, flagged_only)
                    writer.write(
                        px if config.reference_compat
                        else np.ascontiguousarray(px[..., ::-1])
                    )
            else:
                for idx, frame in reader.frames():
                    e = events.get(idx)
                    if e is not None and _event_drawn(e, flagged_only):
                        _draw_event(frame, e, idx, rgb, flagged_only)
                    writer.write(
                        frame if config.reference_compat
                        else np.ascontiguousarray(frame[..., ::-1])
                    )


def analyze_videos_annotated(
    detector,
    paths: Sequence[str],
    output_paths: Sequence[str],
    *,
    mesh=None,
) -> List[BatchVideoResult]:
    """Shared-device-batch scoring of N same-resolution videos PLUS a
    per-video annotated output (the /analyze-video contract).

    TPU-first split of the work: ONE pass through the StreamScheduler does
    all device computation for every video at once (decisions exactly equal
    each video's solo analysis — the scheduler's interleaving-exactness
    property), and annotation becomes a host-only re-render from the
    recorded per-frame events.  N concurrent server jobs therefore share
    device batches instead of serializing N full analyses (the reference
    runs strictly one at a time, server/server.py:611).

    Composes with multi-face detectors (config.multi_face): the scheduler
    runs its per-track mode, results carry per-track scores, and the
    re-render draws every updated track's red/green box — exactly the solo
    ``analyze_video_multiface`` output contract, now batched over jobs."""
    from truely_tpu.pipeline.stream_files import stream_videos

    assert len(paths) == len(output_paths)
    events: Dict[int, Dict[int, object]] = {i: {} for i in range(len(paths))}

    def on_event(e):
        events[e.stream_id][e.frame_index] = e

    summaries = stream_videos(
        detector, paths, mesh=mesh, on_event=on_event,
    )
    out = []
    for i, (s, opath) in enumerate(zip(summaries, output_paths)):
        render_annotated(detector.config, paths[i], opath, events[i])
        out.append(
            BatchVideoResult(
                path=s.path,
                fake_score=s.fake_score,
                frame_count=s.frame_count,
                fps=s.fps,
                total_processed=s.processed,
                flagged_count=s.flagged_count,
                suspicious_frames=s.suspicious_frames,
                output_path=opath,
                track_scores=s.track_scores,
            )
        )
    return out
