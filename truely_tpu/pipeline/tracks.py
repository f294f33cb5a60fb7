"""Multi-face tracking with per-track consistency scoring.

The reference analyzes only ``boxes[0]`` — the single largest face per frame
(server/model.py:49) — so panel/crowd videos lose everyone else.  This module
is the BASELINE.json config-4 extension: up to ``max_tracks`` faces per frame
are embedded, greedily associated to persistent tracks by box IoU, and each
track runs its own resettable run-length counter and score; the video's
fake score aggregates as the max over tracks (the most suspicious face).

Everything is jittable with static shapes: per-frame association is a fixed
``min(T, K)``-step greedy argmax over the (T, K) IoU matrix, and the
timeline folds through a ``lax.scan`` whose carry is the track state (the
same streamable-state pattern as ops/temporal.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from truely_tpu.ops.boxes import iou_matrix


class TrackState(NamedTuple):
    active: jax.Array         # (T,) bool
    box: jax.Array            # (T, 4) f32 last matched box
    embedding: jax.Array      # (T, D) f32 last face embedding
    has_prev: jax.Array       # (T,) bool — embedding valid
    counter: jax.Array        # (T,) i32 run-length counter
    flagged_count: jax.Array  # (T,) i32
    processed: jax.Array      # (T,) i32 frames with a counter update
    misses: jax.Array         # (T,) i32 consecutive unmatched frames
    final_counter: jax.Array  # (T,) i32 counter as of last update


class TrackFrameOut(NamedTuple):
    track_flagged: jax.Array  # (T,) bool
    track_sim: jax.Array      # (T,) f32
    track_box: jax.Array      # (T, 4) f32
    track_active: jax.Array   # (T,) bool
    track_updated: jax.Array  # (T,) bool — matched w/ previous embedding


def init_track_state(max_tracks: int, dim: int) -> TrackState:
    t = max_tracks
    return TrackState(
        active=jnp.zeros((t,), bool),
        box=jnp.zeros((t, 4), jnp.float32),
        embedding=jnp.zeros((t, dim), jnp.float32),
        has_prev=jnp.zeros((t,), bool),
        counter=jnp.zeros((t,), jnp.int32),
        flagged_count=jnp.zeros((t,), jnp.int32),
        processed=jnp.zeros((t,), jnp.int32),
        misses=jnp.zeros((t,), jnp.int32),
        final_counter=jnp.zeros((t,), jnp.int32),
    )


def _greedy_match(track_boxes, track_active, det_boxes, det_valid,
                  match_iou: float) -> Tuple[jax.Array, jax.Array]:
    """Greedy global-argmax assignment between T tracks and K detections.

    Returns (det_for_track (T,) int32 with -1 for unmatched,
             track_for_det (K,) int32 with -1 for unmatched).
    """
    t = track_boxes.shape[0]
    k = det_boxes.shape[0]
    both = jnp.concatenate([track_boxes, det_boxes], axis=0)
    iou = iou_matrix(both, plus_one=False)[:t, t:]  # (T, K)
    score = jnp.where(track_active[:, None] & det_valid[None, :], iou, -1.0)

    det_for_track = jnp.full((t,), -1, jnp.int32)
    track_for_det = jnp.full((k,), -1, jnp.int32)

    def body(_, carry):
        score, det_for_track, track_for_det = carry
        flat = jnp.argmax(score)
        ti, ki = flat // k, flat % k
        ok = score[ti, ki] >= match_iou
        det_for_track = jnp.where(
            ok, det_for_track.at[ti].set(ki.astype(jnp.int32)), det_for_track
        )
        track_for_det = jnp.where(
            ok, track_for_det.at[ki].set(ti.astype(jnp.int32)), track_for_det
        )
        score = score.at[ti, :].set(-1.0)
        score = score.at[:, ki].set(-1.0)
        return score, det_for_track, track_for_det

    _, det_for_track, track_for_det = jax.lax.fori_loop(
        0, min(t, k), body, (score, det_for_track, track_for_det)
    )
    return det_for_track, track_for_det


def track_step(
    state: TrackState,
    det_boxes: jax.Array,     # (K, 4)
    det_valid: jax.Array,     # (K,)
    det_emb: jax.Array,       # (K, D)
    *,
    similarity_threshold: float = 0.99,
    run_length_threshold: int = 15,
    match_iou: float = 0.3,
    max_misses: int = 10,
) -> Tuple[TrackState, TrackFrameOut]:
    """Fold one frame's detections into the track state."""
    t = state.box.shape[0]
    k = det_boxes.shape[0]
    det_for_track, track_for_det = _greedy_match(
        state.box, state.active, det_boxes, det_valid, match_iou
    )
    matched = det_for_track >= 0
    safe_det = jnp.maximum(det_for_track, 0)
    new_box = det_boxes[safe_det]
    new_emb = det_emb[safe_det]

    # Similarity + counter update for matched tracks with a previous emb.
    update = jnp.logical_and(matched, state.has_prev)
    dot = jnp.sum(new_emb * state.embedding, axis=-1)
    norms = jnp.linalg.norm(new_emb, axis=-1) * jnp.linalg.norm(
        state.embedding, axis=-1
    )
    sim = jnp.where(update, dot / jnp.maximum(norms, 1e-12), 0.0)
    below = sim < similarity_threshold
    counter = jnp.where(
        update, jnp.where(below, state.counter + 1, 0), state.counter
    )
    flagged = jnp.logical_and(update, counter > run_length_threshold)

    # Track bookkeeping: matched tracks refresh; unmatched accrue misses and
    # retire after max_misses.
    misses = jnp.where(matched, 0, state.misses + state.active.astype(jnp.int32))
    active = jnp.logical_and(state.active, misses <= max_misses)
    active = jnp.logical_or(active, matched)

    # Spawn: unmatched detections claim inactive slots, best score first
    # (here: detection order, which the cascade emits score-sorted).
    unmatched_det = jnp.logical_and(det_valid, track_for_det < 0)
    free_slot = jnp.logical_not(active)
    # rank unmatched detections and free slots
    det_rank = jnp.cumsum(unmatched_det.astype(jnp.int32)) - 1  # rank per det
    slot_rank = jnp.cumsum(free_slot.astype(jnp.int32)) - 1     # rank per slot
    # slot s takes the unmatched detection with rank == slot_rank[s]
    det_ranks_full = jnp.where(unmatched_det, det_rank, k + 1)
    # invert: for each rank r, which det has it
    det_by_rank = jnp.full((t,), -1, jnp.int32)
    order = jnp.argsort(det_ranks_full)  # unmatched dets first by rank
    n_unmatched = jnp.sum(unmatched_det.astype(jnp.int32))
    take = min(t, k)
    cand = order[:take].astype(jnp.int32)
    cand_rank = jnp.arange(take, dtype=jnp.int32)
    det_by_rank = det_by_rank.at[cand_rank].set(
        jnp.where(cand_rank < n_unmatched, cand, -1)
    )
    spawn_det = jnp.where(
        free_slot, det_by_rank[jnp.clip(slot_rank, 0, t - 1)], -1
    )
    spawns = spawn_det >= 0
    spawn_safe = jnp.maximum(spawn_det, 0)

    box = jnp.where(
        matched[:, None], new_box,
        jnp.where(spawns[:, None], det_boxes[spawn_safe], state.box),
    )
    emb = jnp.where(
        matched[:, None], new_emb,
        jnp.where(spawns[:, None], det_emb[spawn_safe], state.embedding),
    )
    has_prev = jnp.logical_or(jnp.logical_or(matched, spawns), state.has_prev)
    # A spawned track resets its history — including accumulated stats, so a
    # slot vacated by a retired track can't leak the previous face's
    # flagged/processed counts into the new occupant's score.
    counter = jnp.where(spawns, 0, counter)
    has_prev = jnp.where(spawns, True, has_prev)
    active = jnp.logical_or(active, spawns)
    misses = jnp.where(spawns, 0, misses)
    flagged_count = jnp.where(
        spawns, 0, state.flagged_count + flagged.astype(jnp.int32)
    )
    processed = jnp.where(spawns, 0, state.processed + update.astype(jnp.int32))
    final_counter = jnp.where(
        spawns, 0, jnp.where(update, counter, state.final_counter)
    )

    new_state = TrackState(
        active=active,
        box=box,
        embedding=emb,
        has_prev=has_prev,
        counter=counter,
        flagged_count=flagged_count,
        processed=processed,
        misses=misses,
        final_counter=final_counter,
    )
    out = TrackFrameOut(
        track_flagged=flagged,
        track_sim=sim,
        track_box=box,
        track_active=active,
        track_updated=update,
    )
    return new_state, out


def track_timeline(
    state: TrackState,
    boxes: jax.Array,    # (F, K, 4)
    valid: jax.Array,    # (F, K)
    emb: jax.Array,      # (F, K, D)
    n_valid_frames: jax.Array,
    **kwargs,
) -> Tuple[TrackState, TrackFrameOut]:
    """Fold a batch of frames through the tracker (lax.scan over time).
    Frames at index >= n_valid_frames are inert."""
    f = boxes.shape[0]

    def step(carry, inputs):
        st = carry
        i, b, v, e = inputs
        v = jnp.logical_and(v, i < n_valid_frames)
        new_st, out = track_step(st, b, v, e, **kwargs)
        # Inert frames keep the old state entirely.
        live = i < n_valid_frames
        merged = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                jnp.reshape(live, (1,) * new.ndim), new, old
            ),
            new_st, st,
        )
        return merged, out

    idx = jnp.arange(f, dtype=jnp.int32)
    final_state, outs = jax.lax.scan(step, state, (idx, boxes, valid, emb))
    return final_state, outs


def track_scores(
    state: TrackState,
    frame_count: jax.Array,
    fps: jax.Array,
    *,
    run_length_threshold: int = 15,
    long_video_seconds: int = 30,
) -> jax.Array:
    """Per-track 0-100 fake scores using the reference's formula per track
    (ops/temporal.weighted_score semantics); inactive/empty tracks score 0."""
    from truely_tpu.ops.temporal import weighted_score

    scores = weighted_score(
        state.flagged_count,
        state.final_counter,
        state.processed,
        frame_count,
        fps,
        run_length_threshold=run_length_threshold,
        long_video_seconds=long_video_seconds,
    )
    return jnp.where(state.processed > 0, scores, 0)
