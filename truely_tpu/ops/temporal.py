"""Temporal consistency scoring as a parallel associative scan.

The reference computes this with a sequential Python loop over sampled frames
(server/model.py:60-95): cosine similarity between each face embedding and the
*previous* face embedding, a run-length counter that increments while the
similarity stays below a threshold and resets to zero otherwise, a flag when
the run exceeds a threshold, and a final weighted score.

The only true sequential dependency is the resettable counter

    c[t] = (c[t-1] + 1)  if update[t] and below[t]
           0             if update[t] and not below[t]
           c[t-1]        if not update[t]           (no face / no predecessor)

Each step is the affine map ``c -> a*c + b`` with

    (a, b) = (1, 0)            when the frame does not update the counter
    (a, b) = (below, below)    when it does  (below in {0, 1})

and affine maps compose associatively, so the whole counter is a single
``jax.lax.associative_scan`` — O(log T) depth on TPU instead of O(T) Python
iterations.  "Previous face embedding" (which skips face-less frames,
model.py:75) is a cumulative max of face-frame indices plus one gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TemporalState(NamedTuple):
    """Scan carry across frame batches / timeline shards.

    Makes the temporal pass streamable: a video (or live stream) is processed
    in fixed-size batches, each batch folding into this state, with results
    identical to one whole-timeline pass (tested in test_temporal.py).
    """

    prev_embedding: jax.Array  # (D,) f32 — last face embedding seen
    has_prev: jax.Array        # () bool — whether any face has been seen
    counter: jax.Array         # () i32 — run-length counter


def init_temporal_state(dim: int) -> TemporalState:
    return TemporalState(
        prev_embedding=jnp.zeros((dim,), jnp.float32),
        has_prev=jnp.asarray(False),
        counter=jnp.int32(0),
    )


class TemporalResult(NamedTuple):
    """Per-sampled-frame temporal outputs plus scalar summary.

    All leading axes are the sampled-frame timeline (static length T, padded;
    frames at ``t >= n_sampled`` are inert).
    """

    similarity: jax.Array      # (T,) f32 cosine sim vs previous face (0 where undefined)
    counter: jax.Array         # (T,) i32 run-length counter after the frame's update
    flagged: jax.Array         # (T,) bool — drawn red ("AI Detected") in the overlay
    annotated: jax.Array       # (T,) bool — any box drawn (red or green)
    has_face: jax.Array        # (T,) bool
    flagged_count: jax.Array   # () i32 — reference deep_fake_frame_count
    final_counter: jax.Array   # () i32 — counter value at end of video
    state: TemporalState       # carry for the next batch


def _affine_compose(left, right):
    """Compose affine maps: apply ``left`` first, then ``right``."""
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def resettable_run_length(
    update: jax.Array, below: jax.Array, initial: jax.Array | int = 0
) -> jax.Array:
    """Run-length counter with reset, as an associative scan.

    Args:
      update: (T,) bool — whether the frame updates the counter at all.
      below:  (T,) bool — similarity below threshold (only read where update).
      initial: () i32 — counter value carried in from a previous batch.

    Returns:
      (T,) int32 counter value after each frame's update.
    """
    below_i = below.astype(jnp.int32)
    a = jnp.where(update, below_i, 1)
    b = jnp.where(update, below_i, 0)
    a_cum, b_cum = jax.lax.associative_scan(_affine_compose, (a, b))
    return a_cum * jnp.int32(initial) + b_cum


def previous_face_index(has_face: jax.Array) -> jax.Array:
    """For each frame, the index of the last face-bearing frame strictly
    before it, or -1 (reference ``previous_face_encoding`` chaining,
    model.py:60,75)."""
    t = has_face.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    marked = jnp.where(has_face, idx, -1)
    cummax = jax.lax.associative_scan(jnp.maximum, marked)
    return jnp.concatenate([jnp.full((1,), -1, jnp.int32), cummax[:-1]])


def temporal_consistency(
    embeddings: jax.Array,
    has_face: jax.Array,
    n_sampled: jax.Array,
    *,
    state: TemporalState | None = None,
    similarity_threshold: float = 0.99,
    run_length_threshold: int = 15,
) -> TemporalResult:
    """Temporal consistency over a (batch of the) timeline, jittable.

    Args:
      embeddings: (T, D) f32 face embeddings (garbage rows where no face).
      has_face:   (T,) bool.
      n_sampled:  () i32 — number of real (non-padding) sampled frames.
      state:      carry from the previous batch (None = start of video).

    Padding frames must have ``has_face=False`` **or** be beyond
    ``n_sampled``; either way they are forced inert here.  Folding a
    timeline batch-by-batch through ``result.state`` is exactly equivalent
    to one whole-timeline call.
    """
    t_axis, dim = embeddings.shape
    if state is None:
        state = init_temporal_state(dim)
    idx = jnp.arange(t_axis, dtype=jnp.int32)
    valid = idx < n_sampled
    has_face = jnp.logical_and(has_face, valid)

    emb = embeddings.astype(jnp.float32)
    # Virtual slot 0 carries the previous batch's last face embedding, so
    # prev-face indexing is uniform: ext index t+1 == batch index t.
    emb_ext = jnp.concatenate([state.prev_embedding[None], emb], axis=0)
    has_face_ext = jnp.concatenate([state.has_prev[None], has_face], axis=0)
    prev_idx = previous_face_index(has_face_ext)[1:]  # (T,) into ext coords
    has_prev = jnp.logical_and(has_face, prev_idx >= 0)

    prev_emb = jnp.take(emb_ext, jnp.maximum(prev_idx, 0), axis=0)
    # Cosine similarity exactly as model.py:61 (dot / (||a|| * ||b||)).
    dot = jnp.sum(emb * prev_emb, axis=-1)
    norms = jnp.linalg.norm(emb, axis=-1) * jnp.linalg.norm(prev_emb, axis=-1)
    sim = jnp.where(has_prev, dot / jnp.maximum(norms, 1e-12), 0.0)

    below = sim < similarity_threshold
    counter = resettable_run_length(has_prev, below, state.counter)
    flagged = jnp.logical_and(has_prev, counter > run_length_threshold)

    # Next-batch carry: last face embedding in this batch (or the old one).
    last_face_ext = previous_face_index(
        jnp.concatenate([has_face_ext, jnp.ones((1,), bool)], axis=0)
    )[-1]
    new_prev = emb_ext[jnp.maximum(last_face_ext, 0)]
    new_state = TemporalState(
        prev_embedding=new_prev,
        has_prev=jnp.logical_or(state.has_prev, jnp.any(has_face)),
        counter=counter[-1] if t_axis > 0 else state.counter,
    )

    return TemporalResult(
        similarity=sim,
        counter=counter,
        flagged=flagged,
        annotated=has_prev,
        has_face=has_face,
        flagged_count=jnp.sum(flagged.astype(jnp.int32)),
        final_counter=new_state.counter,
        state=new_state,
    )


def weighted_score(
    flagged_count: jax.Array,
    final_counter: jax.Array,
    total_processed: jax.Array,
    frame_count: jax.Array,
    fps: jax.Array,
    *,
    run_length_threshold: int = 15,
    long_video_seconds: int = 30,
    long_weight: float = 0.5,
    short_weight: float = 0.3,
) -> jax.Array:
    """Final 0-100 fake score, bit-matching reference model.py:86-95.

    ``final_counter`` is the run-length counter as it stood at the *end* of
    the video (the reference reuses the loop variable ``deepfake_count``
    after the loop, model.py:90 — a quirk preserved deliberately).
    """
    total = jnp.maximum(total_processed.astype(jnp.float32), 1.0)
    pct = flagged_count.astype(jnp.float32) / total * 100.0
    conf = jnp.minimum(
        pct * (final_counter.astype(jnp.float32) / float(run_length_threshold)),
        100.0,
    )
    is_long = frame_count > fps * long_video_seconds
    weight = jnp.where(is_long, long_weight, short_weight)
    weighted = jnp.minimum(pct + conf * weight, 100.0)
    score = jnp.clip(jnp.floor(weighted), 0.0, 100.0).astype(jnp.int32)
    return jnp.where(total_processed > 0, score, 0)
