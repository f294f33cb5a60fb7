"""Real-time multi-stream scheduler (BASELINE config 5).

Multiplexes N concurrent video streams into shared device batches: each
``step()`` packs up to ``frames_per_stream`` queued sampled frames from
every stream into one (N * F, H, W, 3) batch, runs the single compiled
detector step, then folds each stream's slice through its own temporal
state with a vmapped scan — so per-stream scoring is exactly what each
stream would get analyzed alone (tested), while the TPU sees one big batch.

The reference has no streaming mode at all (strictly one blocking video at
a time, SURVEY.md §2.3); this is the design SURVEY.md §7 calls the
"streaming config" hard part: a per-stream ring buffer + batch scheduler
with scan state carried across batches.

Multi-chip: pass ``mesh=`` to shard the packed batch's frame axis over a
``jax.sharding.Mesh`` data axis (BASELINE config 5's v5e-4 slice).  The
step runs through ``parallel.sharding.shard_frame_step`` — XLA splits the
batch across chips and inserts the collectives — while the per-stream
temporal fold (tiny) and ring buffers are unchanged, so events and scores
are exactly the single-chip ones (tested on the virtual CPU mesh).
"""

from __future__ import annotations

import collections
from dataclasses import dataclass
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from truely_tpu.config import DetectorConfig
from truely_tpu.ops.temporal import (
    init_temporal_state, temporal_consistency, weighted_score,
)


@dataclass
class StreamEvent:
    stream_id: int
    frame_index: int
    has_face: bool
    flagged: bool
    annotated: bool
    box: Tuple[float, float, float, float]
    similarity: float
    counter: int


@dataclass
class MultiFaceStreamEvent:
    """Per-sampled-frame event in multi-face mode: one entry per track slot
    (pipeline/tracks.TrackFrameOut fetched to host).  ``track_updated[t]``
    means track t matched a detection AND had a previous embedding — the
    exact condition under which ``analyze_video_multiface`` draws its box,
    so host annotation from these events reproduces the solo renderer."""

    stream_id: int
    frame_index: int
    track_boxes: Tuple[Tuple[float, float, float, float], ...]  # (T, 4)
    track_updated: Tuple[bool, ...]
    track_flagged: Tuple[bool, ...]
    track_sim: Tuple[float, ...]
    track_active: Tuple[bool, ...]

    @property
    def has_face(self) -> bool:
        return any(self.track_updated)

    @property
    def flagged(self) -> bool:
        return any(self.track_flagged)

    @property
    def annotated(self) -> bool:
        return any(self.track_updated)


@dataclass
class StreamStats:
    processed: int = 0       # sampled frames analyzed
    flagged_count: int = 0
    frames_seen: int = 0     # total frames pushed (incl. unsampled)
    pending: int = 0


class StreamScheduler:
    def __init__(
        self,
        detector,
        n_streams: int,
        *,
        frames_per_stream: Optional[int] = None,
        fps: int = 60,
        mesh=None,
        data_axis: str = "data",
        yuv: bool = False,
        detect_interval: Optional[int] = None,
        multi_face: Optional[bool] = None,
    ):
        """``yuv=True``: pushed frames are packed I420 pictures
        ((H*3//2, W) uint8, e.g. from ``VideoReader.yuv_frames``) instead
        of HWC BGR/RGB; the exact on-device conversion runs inside the
        batch step, halving the per-step upload.  Events/scores are
        bit-identical to BGR feeding (tests/test_yuv.py).

        ``detect_interval=K > 1`` (default: the detector config's value)
        extends track-propagated detection to streaming: every K-th STEP
        runs the full pyramid+cascade; steps between refine every row from
        its stream's carried seed box through the unchanged stage-2/3
        machinery (detector._frame_step_refine), so O-Net re-scores — and
        can reject — the propagated box on every sampled frame.  Seeds
        roll forward from each stream's latest detected row; a stream that
        loses its face re-acquires at the next keyframe step (<= K-1 steps
        late, the same semantics as Detector propagate mode), and a step
        where NO stream holds a seed is promoted to a keyframe.

        ``multi_face=True`` (default: the detector config's value) runs the
        per-track steps (BASELINE config 4) instead of the single-face
        step: every stream carries its own ``TrackState`` across steps, the
        device sees one packed multi-face batch, and per-stream per-track
        decisions are exactly what ``analyze_video_multiface`` would emit
        for that stream alone (tested) — the config-4 x config-5
        composition the reference supports in neither form
        (/root/reference/server/model.py:49 keeps ``boxes[0]`` only;
        server.py:611 analyzes one video at a time).  Events are
        ``MultiFaceStreamEvent`` (per-track boxes/flags); with
        ``detect_interval=K > 1`` each stream's T track seeds propagate
        through the multi-seed refinement step between keyframe steps."""
        self.detector = detector
        self.config: DetectorConfig = detector.config
        self.n_streams = n_streams
        self.yuv = yuv
        self.fps = fps
        self.multi_face = (
            multi_face if multi_face is not None else self.config.multi_face
        )
        self.sample_interval = self.config.sample_interval(fps)
        f = frames_per_stream or max(1, self.config.frame_batch // n_streams)
        self.frames_per_stream = f
        # A mesh-constructed Detector is ALWAYS sharded (its step is jitted
        # with in_shardings), so default to its mesh: feeding it unsharded
        # batches would bypass the divisibility guard and pay a device-0
        # upload + reshard hop per step.
        if mesh is None and getattr(detector, "mesh", None) is not None:
            mesh = detector.mesh
            data_axis = detector._data_axis
        self._mesh = mesh
        if mesh is not None:
            n_dp = mesh.shape[data_axis]
            if (n_streams * f) % n_dp:
                raise ValueError(
                    f"streams*frames_per_stream ({n_streams}*{f}) must be "
                    f"divisible by the '{data_axis}' mesh axis ({n_dp})"
                )
            # Cached on the detector: re-jitting per scheduler cost a full
            # retrace + replicated weight re-upload per construction.
            (self._sharded_step, self._sharded_params,
             self._frames_sharding) = detector.sharded_step(
                 mesh, data_axis, yuv=yuv, multiface=self.multi_face
             )
        elif self.multi_face:
            # pre-resolve the unsharded multi-face step (and its track jits)
            if yuv:
                self._mf_step = detector._ensure_mstep_yuv()
            else:
                detector._ensure_track_jits()
                self._mf_step = detector._mstep
        self._queues: List[Deque[Tuple[int, np.ndarray]]] = [
            collections.deque() for _ in range(n_streams)
        ]
        # Embedding width comes from the detector's loaded weights (its
        # single source of truth), never re-hardcoded here.
        if self.multi_face:
            from truely_tpu.pipeline.tracks import (
                init_track_state, track_scores, track_timeline,
            )
            from functools import partial

            self._states = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * n_streams),
                init_track_state(self.config.max_tracks,
                                 detector.embedding_dim),
            )
            # Per-stream track folds batched into one jit: vmap over the
            # stream axis of (state, boxes (F,T,4), valid (F,T),
            # emb (F,T,D), n_valid) — each stream's fold is exactly the
            # solo analyze_video_multiface one (sequential scan over its
            # own rows), so interleaving across steps stays exact.
            self._vtrack_fold = jax.jit(
                jax.vmap(
                    partial(
                        track_timeline,
                        similarity_threshold=self.config.similarity_threshold,
                        run_length_threshold=self.config.run_length_threshold,
                    )
                )
            )
            self._tscores = jax.jit(
                partial(
                    track_scores,
                    run_length_threshold=self.config.run_length_threshold,
                    long_video_seconds=self.config.long_video_seconds,
                )
            )
        else:
            self._states = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * n_streams),
                init_temporal_state(detector.embedding_dim),
            )
        self.stats: Dict[int, StreamStats] = {
            i: StreamStats() for i in range(n_streams)
        }
        # Batch-efficiency counters: a partial step still uploads the full
        # zero-padded (n_streams*frames_per_stream) batch (jit = static
        # shapes), which matters on H2D-starved rigs — these make the
        # padding cost observable instead of guessed at.
        self.steps_run = 0
        self.frames_stepped = 0      # valid rows actually scored
        self.frames_padded = 0       # zero rows uploaded alongside them

        k = (detect_interval if detect_interval is not None
             else self.config.detect_interval)
        # "auto": adaptive keyframe cadence — the per-step interval
        # ladders 1 -> 2 -> ... -> auto_interval_max while refine steps
        # keep re-acquiring the carried seeds, and collapses back to 1
        # when a step loses too many (the same survivor test the
        # detector's auto mode uses).  The scheduler ladder is
        # single-face: a MULTI-FACE scheduler handed "auto" (e.g. the
        # serve group runner wrapping a multiface-auto detector, whose
        # solo analyze paths do ladder) degrades to full detection every
        # step — the exactness-vs-solo-full contract, never an error mid
        # job; use a fixed interval for propagated multi-face streaming.
        self.auto_interval = k == "auto"
        if self.auto_interval and self.multi_face:
            self.auto_interval = False
            k = 1
        if self.auto_interval:
            kmax = self.config.auto_interval_max
            if kmax < 2:
                raise ValueError(
                    f"auto_interval_max must be >= 2, got {kmax}"
                )
            self._cur_k = 1
            k = kmax
        elif not isinstance(k, int) or k < 1:
            raise ValueError(
                f'detect_interval must be an int >= 1 or "auto", got {k!r}'
            )
        self.detect_interval = k
        self.keyframe_steps = 0      # full-cascade steps actually run
        if k > 1:
            if self.multi_face:
                t = self.config.max_tracks
                self._seed_box = np.zeros((n_streams, t, 4), np.float32)
                self._seed_valid = np.zeros((n_streams, t), bool)
            else:
                self._seed_box = np.zeros((n_streams, 4), np.float32)
                self._seed_valid = np.zeros((n_streams,), bool)
            self._since_keyframe = 0
            if mesh is not None:
                self._refine_step, _ = detector.sharded_refine_step(
                    mesh, data_axis, yuv=yuv, rows_per_seed=f,
                    multiface=self.multi_face,
                )
            elif self.multi_face:
                self._refine_step = detector._ensure_stream_mrefine_step(
                    yuv, f
                )
            else:
                self._refine_step = detector._ensure_stream_refine_step(
                    yuv, f
                )
        if not self.multi_face:
            self._vtemporal = jax.jit(
                jax.vmap(
                    lambda e, h, n, s: temporal_consistency(
                        e, h, n, state=s,
                        similarity_threshold=self.config.similarity_threshold,
                        run_length_threshold=self.config.run_length_threshold,
                    )
                )
            )

    # ------------------------------------------------------------------

    def push(self, stream_id: int, frame: np.ndarray) -> None:
        """Feed the next frame of a stream; frames are ~7 Hz-sampled here
        (reference sampling law) and queued for the next batch step."""
        st = self.stats[stream_id]
        if st.frames_seen % self.sample_interval == 0:
            self._queues[stream_id].append((st.frames_seen, frame))
            st.pending += 1
        st.frames_seen += 1

    def push_sampled(self, stream_id: int, frame: np.ndarray,
                     frame_index: int, frames_seen: int) -> None:
        """Feed an already-sampled frame (callers that apply their own
        per-stream sampling law, e.g. batch video analysis where fps
        differs between videos).  ``frames_seen`` keeps the rolling-score
        denominator honest."""
        st = self.stats[stream_id]
        self._queues[stream_id].append((frame_index, frame))
        st.pending += 1
        st.frames_seen = frames_seen

    def stream_counter(self, stream_id: int) -> int:
        """Current run-length counter of one stream (host fetch).  In
        multi-face mode: the max counter over the stream's tracks."""
        c = np.asarray(self._states.counter[stream_id])
        return int(c.max()) if self.multi_face else int(c)

    def track_scores_for(self, stream_id: int, *, frames_seen=None,
                         fps=None) -> np.ndarray:
        """Per-track 0-100 fake scores for one stream (multi-face mode):
        the reference formula per track over this stream's TrackState —
        exactly what ``analyze_video_multiface`` returns for the stream
        analyzed alone."""
        if not self.multi_face:
            raise ValueError("track_scores_for requires multi_face mode")
        st = self.stats[stream_id]
        fc = frames_seen if frames_seen is not None else st.frames_seen
        fv = fps if fps is not None else self.fps
        state_i = jax.tree_util.tree_map(
            lambda x: x[stream_id], self._states
        )
        return np.asarray(self._tscores(state_i, jnp.int32(fc), jnp.int32(fv)))

    def reset_stream(self, stream_id: int) -> None:
        """Recycle a stream slot for a new live stream: drop queued frames
        and zero the temporal state and stats.  Live feeds churn — a
        viewer closes one video and opens another — and the slot must not
        carry the previous stream's run-length/counter into the next
        (same statistics-leak class the track spawner resets against,
        pipeline/tracks.py)."""
        self._queues[stream_id].clear()
        if self.detect_interval > 1:
            # the next stream must not inherit this one's track seed
            self._seed_valid[stream_id] = False
            self._seed_box[stream_id] = 0.0
        # Derive the embedding dim from the constructed state rather than
        # re-hardcoding it: a mismatched fresh state would corrupt the slot.
        if self.multi_face:
            from truely_tpu.pipeline.tracks import init_track_state

            fresh = init_track_state(
                self._states.box.shape[1], self._states.embedding.shape[-1]
            )
        else:
            fresh = init_temporal_state(self._states.prev_embedding.shape[-1])
        self._states = jax.tree_util.tree_map(
            lambda all_s, f: all_s.at[stream_id].set(f), self._states, fresh
        )
        self.stats[stream_id] = StreamStats()

    def pending(self) -> int:
        return sum(len(q) for q in self._queues)

    # ------------------------------------------------------------------

    def step(self) -> List[StreamEvent]:
        """Run one shared device batch over whatever is queued."""
        s, f = self.n_streams, self.frames_per_stream
        sample = None
        for q in self._queues:
            if q:
                sample = q[0][1]
                break
        if sample is None:
            return []
        batch = np.zeros((s, f) + sample.shape, np.uint8)
        n_valid = np.zeros((s,), np.int32)
        indices: List[List[int]] = [[] for _ in range(s)]
        for i, q in enumerate(self._queues):
            while q and len(indices[i]) < f:
                idx, frame = q.popleft()
                batch[i, len(indices[i])] = frame
                indices[i].append(idx)
                self.stats[i].pending -= 1
            n_valid[i] = len(indices[i])

        n_total = int(n_valid.sum())
        self.steps_run += 1
        self.frames_stepped += n_total
        self.frames_padded += s * f - n_total

        flat = batch.reshape((s * f,) + sample.shape)
        run_full = True
        if self.detect_interval > 1:
            # keyframe cadence: full cascade every K-th step (the current
            # ladder rung in auto mode), promoted early when no stream
            # holds a seed (refines would be no-ops)
            cadence = (self._cur_k if self.auto_interval
                       else self.detect_interval)
            run_full = (self._since_keyframe >= cadence
                        or not self._seed_valid.any())
        seeded_before = (
            self._seed_valid.copy()
            if self.detect_interval > 1 and self.auto_interval
            else None
        )
        if self._mesh is not None:
            # device_put the HOST array with the sharding directly: going
            # through jnp.asarray first lands the whole batch on device 0
            # and reshards device-to-device — an extra full-batch hop in
            # the per-step hot path.
            frames_dev = jax.device_put(flat, self._frames_sharding)
            params = self._sharded_params
        else:
            frames_dev = jnp.asarray(flat)
            params = self.detector.params
        if self.multi_face:
            return self._multiface_substep(
                frames_dev, params, run_full, n_valid, indices
            )
        if not run_full:
            out = self._refine_step(
                params, frames_dev,
                jnp.asarray(self._seed_box), jnp.asarray(self._seed_valid),
            )
        elif self._mesh is not None:
            out = self._sharded_step(params, frames_dev)
        elif self.yuv:
            out = self.detector._ensure_yuv_step()(params, frames_dev)
        else:
            out = self.detector.step_device(frames_dev)
        if self.detect_interval > 1:
            if run_full:
                self.keyframe_steps += 1
                self._since_keyframe = 1
            else:
                self._since_keyframe += 1
        emb = out.embedding.reshape(s, f, -1)
        has_face = out.has_face.reshape(s, f)
        res = self._vtemporal(
            emb, has_face, jnp.asarray(n_valid), self._states
        )
        self._states = res.state

        if self.detect_interval > 1:
            bounds, obox, ohf, hf, ann, flg, sim, cnt = jax.device_get(
                (out.crop_bounds, out.box, out.has_face, res.has_face,
                 res.annotated, res.flagged, res.similarity, res.counter)
            )
            # roll each stream's seed to its latest detected row; a stream
            # with no detection this step drops its seed and re-acquires
            # at the next keyframe step
            obox = obox.reshape(s, f, 4)
            ohf = ohf.reshape(s, f)
            for i in range(s):
                nv = int(n_valid[i])
                if nv == 0:
                    continue
                det_rows = np.nonzero(ohf[i, :nv])[0]
                if det_rows.size:
                    self._seed_box[i] = obox[i, det_rows[-1]]
                    self._seed_valid[i] = True
                else:
                    self._seed_valid[i] = False
            if self.auto_interval:
                self._auto_ladder_update(run_full, seeded_before,
                                         ohf, n_valid)
        else:
            bounds, hf, ann, flg, sim, cnt = jax.device_get(
                (out.crop_bounds, res.has_face, res.annotated, res.flagged,
                 res.similarity, res.counter)
            )
        bounds = bounds.reshape(s, f, 4)
        events: List[StreamEvent] = []
        for i in range(s):
            for j, frame_idx in enumerate(indices[i]):
                events.append(
                    StreamEvent(
                        stream_id=i,
                        frame_index=frame_idx,
                        has_face=bool(hf[i, j]),
                        flagged=bool(flg[i, j]),
                        annotated=bool(ann[i, j]),
                        box=tuple(float(v) for v in bounds[i, j]),
                        similarity=float(sim[i, j]),
                        counter=int(cnt[i, j]),
                    )
                )
            st = self.stats[i]
            st.processed += int(n_valid[i])
            st.flagged_count += int(flg[i, : n_valid[i]].sum())
        return events

    def _auto_ladder_update(self, run_full, seeded_before, ohf,
                            n_valid) -> None:
        """Adaptive-cadence rung update (detect_interval="auto"): after a
        keyframe step, escalate off rung 1 once detection is actually
        tracking (majority of valid rows hold a face); after a refine
        step, re-score the rung from the survivor fraction over rows whose
        stream carried a seed into the step — collapse to 1 on majority
        loss (the propagate_fallback test), escalate on
        <= auto_escalate_lost, hold otherwise."""
        kmax = self.config.auto_interval_max
        s = self.n_streams
        if run_full:
            total = int(n_valid.sum())
            det = sum(
                int(ohf[i, : int(n_valid[i])].sum()) for i in range(s)
            )
            if self._cur_k == 1 and total and det * 2 >= total:
                self._cur_k = min(2, kmax)
            return
        seeded_rows = lost = 0
        for i in range(s):
            if not seeded_before[i]:
                continue
            nv = int(n_valid[i])
            seeded_rows += nv
            lost += nv - int(ohf[i, :nv].sum())
        if seeded_rows == 0 or lost * 2 > seeded_rows:
            self._cur_k = 1
        elif lost <= self.config.auto_escalate_lost * seeded_rows:
            self._cur_k = min(self._cur_k * 2, kmax)

    def _multiface_substep(self, frames_dev, params, run_full,
                           n_valid, indices) -> List[MultiFaceStreamEvent]:
        """Multi-face half of ``step()``: run the packed per-track step (or
        the (S, T)-seeded refinement between keyframe steps), fold each
        stream's slice through its own TrackState, roll seeds, and emit
        per-track events."""
        s, f = self.n_streams, self.frames_per_stream
        t = self.config.max_tracks
        if not run_full:
            boxes, valid, emb = self._refine_step(
                params, frames_dev,
                jnp.asarray(self._seed_box), jnp.asarray(self._seed_valid),
            )
        elif self._mesh is not None:
            boxes, valid, emb = self._sharded_step(params, frames_dev)
        else:
            boxes, valid, emb = self._mf_step(params, frames_dev)
        if self.detect_interval > 1:
            if run_full:
                self.keyframe_steps += 1
                self._since_keyframe = 1
            else:
                self._since_keyframe += 1
        boxes = boxes.reshape(s, f, t, 4)
        valid = valid.reshape(s, f, t)
        emb = emb.reshape(s, f, t, -1)
        self._states, outs = self._vtrack_fold(
            self._states, boxes, valid, emb, jnp.asarray(n_valid)
        )
        tb, tu, tf, tsim, ta, dv, db = jax.device_get(
            (outs.track_box, outs.track_updated, outs.track_flagged,
             outs.track_sim, outs.track_active, valid, boxes)
        )
        if self.detect_interval > 1:
            # roll each stream's T seeds to its latest row with any
            # detection; a stream with none this step drops its seeds and
            # re-acquires at the next keyframe step
            for i in range(s):
                nv = int(n_valid[i])
                if nv == 0:
                    continue
                det_rows = np.nonzero(dv[i, :nv].any(axis=-1))[0]
                if det_rows.size:
                    self._seed_box[i] = db[i, det_rows[-1]]
                    self._seed_valid[i] = dv[i, det_rows[-1]]
                else:
                    self._seed_valid[i] = False
        events: List[MultiFaceStreamEvent] = []
        for i in range(s):
            for j, frame_idx in enumerate(indices[i]):
                events.append(
                    MultiFaceStreamEvent(
                        stream_id=i,
                        frame_index=frame_idx,
                        track_boxes=tuple(
                            tuple(float(v) for v in tb[i, j, tt])
                            for tt in range(t)
                        ),
                        track_updated=tuple(bool(v) for v in tu[i, j]),
                        track_flagged=tuple(bool(v) for v in tf[i, j]),
                        track_sim=tuple(float(v) for v in tsim[i, j]),
                        track_active=tuple(bool(v) for v in ta[i, j]),
                    )
                )
            st = self.stats[i]
            nv = int(n_valid[i])
            st.processed += nv
            # frames where ANY track flagged (display stat; per-track
            # counts live in the TrackState itself)
            st.flagged_count += int(tf[i, :nv].any(axis=-1).sum())
        return events

    def drain(self) -> List[StreamEvent]:
        events: List[StreamEvent] = []
        while self.pending():
            events.extend(self.step())
        return events

    # ------------------------------------------------------------------

    def score(self, stream_id: int) -> int:
        """Rolling fake score for one stream (reference formula over the
        frames seen so far).  Multi-face mode: max over the stream's
        per-track scores (the analyze_video_multiface aggregate)."""
        st = self.stats[stream_id]
        if st.processed == 0:
            return 0
        if self.multi_face:
            return int(self.track_scores_for(stream_id).max(initial=0))
        counter = self.stream_counter(stream_id)
        return int(
            weighted_score(
                jnp.int32(st.flagged_count),
                jnp.int32(counter),
                jnp.int32(st.processed),
                jnp.int32(st.frames_seen),
                jnp.int32(self.fps),
                run_length_threshold=self.config.run_length_threshold,
                long_video_seconds=self.config.long_video_seconds,
            )
        )
