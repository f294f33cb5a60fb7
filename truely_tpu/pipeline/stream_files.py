"""Live multi-stream analysis of video files (BASELINE config 5's product
surface).

The reference processes videos strictly one at a time behind a blocking
endpoint (server/server.py:611); this drives N concurrent streams through
the shared-batch StreamScheduler — one compiled resolution bucket, every
device step packing frames from all streams — and emits per-stream live
events plus end-of-stream summaries with sampled-fps and lag statistics.

Exactness property (tested): each stream's events and final score are
identical to analyzing that stream alone with ``Detector.analyze_video``.

Exposed as ``python -m truely_tpu stream A.mp4 B.mp4 ...`` (cli.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from truely_tpu.media.decode import VideoReader
from truely_tpu.ops.temporal import weighted_score
from truely_tpu.pipeline.streaming import StreamEvent, StreamScheduler


@dataclass
class StreamSummary:
    path: str
    fake_score: int
    frame_count: int
    fps: int
    processed: int            # sampled frames analyzed
    flagged_count: int
    suspicious_frames: List[int]
    wall_s: float             # stream open -> last event
    sampled_fps: float        # processed / wall_s (throughput headroom)
    mean_lag_s: float         # push -> event emission latency
    max_lag_s: float
    yuv_ingest: bool = False
    p50_lag_s: float = 0.0    # lag distribution (BASELINE config 5 asks
    p95_lag_s: float = 0.0    # for sustained sub-frame lag, not just mean)
    # Multi-face mode only: per-track 0-100 scores (fake_score = max).
    track_scores: Optional[List[int]] = None


@dataclass
class _PerStream:
    reader: VideoReader
    it: object
    interval: int
    done: bool = False
    frame_count: int = 0
    push_times: Dict[int, float] = field(default_factory=dict)
    lags: List[float] = field(default_factory=list)
    flagged: List[int] = field(default_factory=list)


def stream_videos(
    detector,
    paths: Sequence[str],
    *,
    frames_per_stream: Optional[int] = None,
    mesh=None,
    realtime: bool = False,
    partial_step_budget: float = 0.0,
    yuv: Optional[bool] = None,
    on_event: Optional[Callable[[StreamEvent], None]] = None,
    scheduler_stats: Optional[dict] = None,
    multi_face: Optional[bool] = None,
) -> List[StreamSummary]:
    """Analyze N same-resolution videos as concurrent live streams.

    ``realtime=True`` paces each stream at its own fps (a live-feed
    simulation — lag stats then reflect steady-state latency); the default
    reads as fast as decode allows (lag stats reflect batching+device time,
    sampled_fps the throughput headroom).  ``yuv=None`` auto-selects
    native-YUV ingestion when every stream is eligible.  ``on_event`` fires
    for every sampled frame as its device step completes.  Pass a dict as
    ``scheduler_stats`` to receive batch-efficiency counters (steps run,
    frames scored, padded rows uploaded — the padding cost of partial
    steps on H2D-starved hosts).

    ``partial_step_budget`` (realtime only): a partial batch runs only
    once its OLDEST queued frame is that many seconds old; until then the
    loop keeps accumulating toward a full batch.  0 (default) steps on any
    paced-idle gap — minimum latency, but every near-empty step still
    uploads the full zero-padded batch (jit = static shapes), which on an
    H2D-starved host trades throughput for nothing.  The budget is a hard
    cap on the extra lag batching can add.

    ``multi_face=None`` follows the detector config: in multi-face mode
    every stream runs per-track scoring (events are MultiFaceStreamEvent,
    summaries carry ``track_scores``, fake_score = max over tracks —
    exactly the solo ``analyze_video_multiface`` result per stream).
    """
    if yuv is None:
        yuv = detector.config.yuv_ingest
    readers = [
        VideoReader(p, rgb=not detector.config.reference_compat, yuv=yuv)
        for p in paths
    ]
    try:
        return _run(detector, paths, readers,
                    frames_per_stream=frames_per_stream, mesh=mesh,
                    realtime=realtime,
                    partial_step_budget=partial_step_budget,
                    on_event=on_event,
                    scheduler_stats=scheduler_stats,
                    multi_face=multi_face)
    finally:
        for r in readers:
            r.close()


def _run(detector, paths, readers, *, frames_per_stream, mesh, realtime,
         on_event, scheduler_stats=None, partial_step_budget=0.0,
         multi_face=None):
    metas = [r.meta for r in readers]
    h, w = metas[0].height, metas[0].width
    for m in metas[1:]:
        if (m.height, m.width) != (h, w):
            raise ValueError(
                "stream_videos requires equal resolutions: "
                f"{(h, w)} vs {(m.height, m.width)}"
            )
    # uniform ingestion: packed-YUV only when every stream is eligible
    use_yuv = all(r.yuv_active for r in readers)
    sched = StreamScheduler(
        detector, n_streams=len(paths),
        frames_per_stream=frames_per_stream, fps=metas[0].fps,
        mesh=mesh, yuv=use_yuv, multi_face=multi_face,
    )
    cfg = detector.config
    streams: List[_PerStream] = []
    for r, m in zip(readers, metas):
        interval = cfg.sample_interval(m.fps)
        it = (r.yuv_frames(interval) if use_yuv
              else _bgr_frames(r, interval))
        streams.append(_PerStream(reader=r, it=it, interval=interval))
    capacity = len(paths) * sched.frames_per_stream

    t_start = time.perf_counter()
    next_due = [t_start] * len(paths)  # realtime pacing

    def handle(events: List[StreamEvent]) -> None:
        now = time.perf_counter()
        for e in events:
            st = streams[e.stream_id]
            pushed = st.push_times.pop(e.frame_index, None)
            if pushed is not None:
                st.lags.append(now - pushed)
            if e.flagged:
                st.flagged.append(e.frame_index)
            if on_event is not None:
                on_event(e)

    while not all(s.done for s in streams):
        now = time.perf_counter()
        for i, st in enumerate(streams):
            if st.done:
                continue
            if realtime and now < next_due[i]:
                continue
            try:
                idx, frame = next(st.it)
            except StopIteration:
                st.done = True
                continue
            st.frame_count += 1
            next_due[i] += 1.0 / max(metas[i].fps_exact, 1.0)
            if frame is not None:
                st.push_times[idx] = time.perf_counter()
                sched.push_sampled(i, frame, idx, st.frame_count)
            else:
                sched.stats[i].frames_seen = st.frame_count
        if sched.pending() >= capacity:
            handle(sched.step())
        elif realtime and all(
            s.done or now < next_due[i] for i, s in enumerate(streams)
        ):
            # paced idle gap: run a partial step rather than sitting on
            # queued frames (live feeds must not wait for a full batch) —
            # unless a partial_step_budget defers it while the oldest
            # queued frame is still younger than the budget
            if sched.pending():
                oldest = min(
                    min(st.push_times.values())
                    for st in streams if st.push_times
                )
                if time.perf_counter() - oldest >= partial_step_budget:
                    handle(sched.step())
                else:
                    time.sleep(0.001)
            else:
                time.sleep(0.001)
    handle(sched.drain())
    wall = time.perf_counter() - t_start
    if scheduler_stats is not None:
        util = (sched.frames_stepped
                / max(1, sched.frames_stepped + sched.frames_padded))
        scheduler_stats.update(
            steps=sched.steps_run,
            frames_scored=sched.frames_stepped,
            frames_padded=sched.frames_padded,
            batch_utilization=util,
        )

    summaries = []
    for i, (path, st, m) in enumerate(zip(paths, streams, metas)):
        stats = sched.stats[i]
        track_scores = None
        if sched.multi_face:
            per_track = sched.track_scores_for(
                i, frames_seen=st.frame_count, fps=m.fps
            )
            track_scores = [int(v) for v in per_track]
            score = (
                int(per_track.max(initial=0)) if stats.processed else 0
            )
        else:
            score = int(
                weighted_score(
                    jnp.int32(stats.flagged_count),
                    jnp.int32(sched.stream_counter(i)),
                    jnp.int32(stats.processed),
                    jnp.int32(st.frame_count),
                    jnp.int32(m.fps),
                    run_length_threshold=cfg.run_length_threshold,
                    long_video_seconds=cfg.long_video_seconds,
                )
            ) if stats.processed else 0
        summaries.append(
            StreamSummary(
                path=path,
                fake_score=score,
                frame_count=st.frame_count,
                fps=m.fps,
                processed=stats.processed,
                flagged_count=stats.flagged_count,
                suspicious_frames=sorted(st.flagged),
                wall_s=wall,
                sampled_fps=stats.processed / wall if wall > 0 else 0.0,
                mean_lag_s=(sum(st.lags) / len(st.lags)) if st.lags else 0.0,
                max_lag_s=max(st.lags) if st.lags else 0.0,
                p50_lag_s=_percentile(st.lags, 0.50),
                p95_lag_s=_percentile(st.lags, 0.95),
                yuv_ingest=use_yuv,
                track_scores=track_scores,
            )
        )
    return summaries


def _percentile(xs: List[float], q: float) -> float:
    """Nearest-rank percentile of a small latency sample (no numpy dep)."""
    if not xs:
        return 0.0
    s = sorted(xs)
    return s[min(len(s) - 1, int(q * len(s)))]


def _bgr_frames(reader: VideoReader, interval: int):
    """(idx, frame-or-None) in the same shape yuv_frames yields."""
    for idx, frame in reader.frames():
        yield idx, (frame if idx % interval == 0 else None)
