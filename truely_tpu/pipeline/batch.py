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
import jax.numpy as jnp

from truely_tpu.media.decode import VideoReader
from truely_tpu.ops.temporal import weighted_score
from truely_tpu.pipeline.streaming import StreamScheduler


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
    fps may differ per video (per-video sampling intervals).
    """
    readers = [VideoReader(p, rgb=not detector.config.reference_compat)
               for p in paths]
    try:
        metas = [r.meta for r in readers]
        h, w = metas[0].height, metas[0].width
        for m in metas[1:]:
            if (m.height, m.width) != (h, w):
                raise ValueError(
                    "analyze_videos requires equal resolutions: "
                    f"{(h, w)} vs {(m.height, m.width)}"
                )
        sched = StreamScheduler(
            detector, n_streams=len(paths),
            frames_per_stream=frames_per_video, fps=metas[0].fps,
            mesh=mesh,
        )
        # Per-video sampling interval (fps may differ between videos);
        # sampling happens here via push_sampled, not in the scheduler.
        intervals = [detector.config.sample_interval(m.fps) for m in metas]

        iters = [r.frames() for r in readers]
        done = [False] * len(paths)
        frame_counts = [0] * len(paths)
        flags: Dict[int, List[int]] = {i: [] for i in range(len(paths))}
        capacity = len(paths) * sched.frames_per_stream

        def drain_events(events):
            for e in events:
                if e.flagged:
                    flags[e.stream_id].append(e.frame_index)

        while not all(done):
            for i, it in enumerate(iters):
                if done[i]:
                    continue
                try:
                    idx, frame = next(it)
                except StopIteration:
                    done[i] = True
                    continue
                frame_counts[i] += 1
                if idx % intervals[i] == 0:
                    sched.push_sampled(i, frame, idx, frame_counts[i])
                else:
                    sched.stats[i].frames_seen = frame_counts[i]
            if sched.pending() >= capacity:
                drain_events(sched.step())
        drain_events(sched.drain())

        results = []
        for i, path in enumerate(paths):
            st = sched.stats[i]
            counter = sched.stream_counter(i)
            score = int(
                weighted_score(
                    jnp.int32(st.flagged_count),
                    jnp.int32(counter),
                    jnp.int32(st.processed),
                    jnp.int32(frame_counts[i]),
                    jnp.int32(metas[i].fps),
                    run_length_threshold=detector.config.run_length_threshold,
                    long_video_seconds=detector.config.long_video_seconds,
                )
            ) if st.processed else 0
            results.append(
                BatchVideoResult(
                    path=path,
                    fake_score=score,
                    frame_count=frame_counts[i],
                    fps=metas[i].fps,
                    total_processed=st.processed,
                    flagged_count=st.flagged_count,
                    suspicious_frames=sorted(flags[i]),
                )
            )
        return results
    finally:
        for r in readers:
            r.close()
