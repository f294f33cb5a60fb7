"""Masked fixed-capacity non-maximum suppression.

The reference gets NMS from facenet_pytorch's numpy greedy loop (dynamic box
counts, one image at a time).  On TPU, dynamic shapes poison compilation, so
this version works on a fixed capacity K with a validity mask: a greedy pass
over score-sorted candidates expressed as a ``fori_loop`` whose body is pure
vector work against a precomputed (K, K) IoU matrix.  K is small (<= a few
hundred), so the O(K^2) matrix and K-step loop are negligible next to the
conv stacks; correctness (exact greedy order) is what matters.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from truely_tpu.ops.boxes import iou_matrix

# Plain Python float, NOT a jnp scalar: a module-level device-array constant
# gets captured by every consuming jit and costs a ~42 ms per-call penalty on
# the remote-TPU runtime (measured — it singlehandedly dominated the 1080p
# cascade until found).
NEG_INF = -1e30


def nms_masked(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    iou_threshold: float,
    method: str = "union",
) -> jnp.ndarray:
    """Exact greedy NMS over (K, 4) boxes with a validity mask.

    Returns a (K,) bool keep-mask in the ORIGINAL order.  Invalid entries are
    never kept.  Ties are broken by index (stable argsort), matching the
    numpy reference behaviour.
    """
    k = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)  # descending
    sboxes = boxes[order]
    svalid = valid[order]
    iou = iou_matrix(sboxes, method=method)
    idx = jnp.arange(k)

    def body(i, state):
        alive, keep = state
        kept_i = jnp.logical_and(alive[i], svalid[i])
        keep = keep.at[i].set(kept_i)
        # Suppress strictly-later candidates overlapping the kept box.
        suppress = jnp.logical_and(kept_i, jnp.logical_and(iou[i] > iou_threshold, idx > i))
        alive = jnp.logical_and(alive, jnp.logical_not(suppress))
        return alive, keep

    alive0 = jnp.ones((k,), dtype=bool)
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep_sorted = jax.lax.fori_loop(0, k, body, (alive0, keep0))

    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep


def nms_masked_batch(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    iou_threshold: float,
    method: str = "union",
    max_rounds: int = 0,
    groups: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched exact greedy NMS over (B, K, 4) boxes with (B, K) masks.

    Same results as vmapping :func:`nms_masked` (tested equivalent), but
    computed as a *round-based parallel* fixpoint instead of a K-step
    sequential scan: in each round, every undecided candidate whose
    higher-ranked overlaps are all already suppressed becomes KEPT, and
    every undecided candidate overlapped by a kept one becomes SUPPRESSED.
    This reproduces the greedy order exactly (induction over the
    suppression DAG) while deciding whole antichains at once: the loop runs
    for the DAG's depth (a handful of rounds in practice, K at pathological
    worst) and each round is pure vectorized VPU work.  The K-step
    sequential scan this replaces was the single largest cost in the whole
    1080p cascade.
    """
    k = boxes.shape[1]
    iou = jax.vmap(lambda bx: iou_matrix(bx, method=method))(boxes)  # (B, K, K)
    idx = jnp.arange(k)
    # "j outranks i": strictly higher score, index tiebreak (stable order).
    outranks = jnp.logical_or(
        scores[:, :, None] > scores[:, None, :],
        jnp.logical_and(
            scores[:, :, None] == scores[:, None, :],
            (idx[:, None] < idx[None, :])[None],
        ),
    )
    # overlap[b, j, i]: candidate j suppresses i if j ends up kept.
    overlap = jnp.logical_and(iou > iou_threshold, outranks)
    overlap = jnp.logical_and(overlap, valid[:, :, None])  # invalid j never acts
    if groups is not None:
        # Independent suppression groups (e.g. per-pyramid-scale NMS run on
        # a mixed candidate set): only same-group pairs interact.
        same = groups[:, :, None] == groups[:, None, :]
        overlap = jnp.logical_and(overlap, same)

    kept0 = jnp.zeros_like(valid)
    suppressed0 = jnp.logical_not(valid)  # invalid candidates are pre-decided

    def cond(state):
        r, kept, suppressed = state
        undecided = jnp.any(jnp.logical_not(jnp.logical_or(kept, suppressed)))
        if max_rounds > 0:
            return jnp.logical_and(undecided, r < max_rounds)
        return undecided

    def body(state):
        r, kept, suppressed = state
        undecided = jnp.logical_not(jnp.logical_or(kept, suppressed))
        # Keep i iff every overlapping higher-ranked j is suppressed,
        # i.e. no overlapping j is kept or still undecided.
        blocker = jnp.logical_or(kept, undecided)
        blocked = jnp.any(jnp.logical_and(overlap, blocker[:, :, None]), axis=1)
        new_kept = jnp.logical_and(undecided, jnp.logical_not(blocked))
        kept = jnp.logical_or(kept, new_kept)
        # Suppress undecided candidates overlapped by anything now kept.
        dead = jnp.any(jnp.logical_and(overlap, kept[:, :, None]), axis=1)
        suppressed = jnp.logical_or(suppressed, jnp.logical_and(undecided, dead))
        return r + 1, kept, suppressed

    _, kept, suppressed = jax.lax.while_loop(
        cond, body, (jnp.int32(0), kept0, suppressed0)
    )
    if max_rounds > 0:
        # Bounded mode: chains deeper than max_rounds (pathological noise —
        # real NMS chains are a handful deep) get a deterministic tail:
        # keep every remaining undecided candidate not overlapped by a kept
        # one.  Exact greedy whenever the fixpoint converged in time.
        undecided = jnp.logical_not(jnp.logical_or(kept, suppressed))
        dead = jnp.any(jnp.logical_and(overlap, kept[:, :, None]), axis=1)
        kept = jnp.logical_or(
            kept, jnp.logical_and(undecided, jnp.logical_not(dead))
        )
    return kept


def topk_select(
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    k_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select up to ``k_out`` highest-score valid entries.

    Returns (indices (k_out,), valid_out (k_out,)).  Indices of invalid slots
    point at 0 and must be ignored via ``valid_out``.
    """
    masked = jnp.where(valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k_out)
    return idx, vals > NEG_INF / 2
