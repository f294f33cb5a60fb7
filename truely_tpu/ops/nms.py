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

NEG_INF = jnp.float32(-1e30)


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
) -> jnp.ndarray:
    """Batched exact greedy NMS over (B, K, 4) boxes with (B, K) masks.

    Same semantics as vmapping :func:`nms_masked` (tested equivalent), but
    one ``while_loop`` processes sorted candidate i across the whole batch
    per step and exits early once every frame's valid candidates are
    exhausted — in practice a handful of iterations instead of K, which
    matters because this loop is the only sequential code in the cascade.
    """
    k = boxes.shape[1]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, axis=1, stable=True)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    svalid = jnp.take_along_axis(valid, order, axis=1)
    iou = jax.vmap(lambda b: iou_matrix(b, method=method))(sboxes)  # (B, K, K)
    idx = jnp.arange(k)
    # Candidates sort before invalid ones, so only the first ``n_needed``
    # sorted slots can ever be kept.
    n_needed = jnp.max(jnp.sum(svalid.astype(jnp.int32), axis=1))

    def cond(state):
        i, _, _ = state
        return i < n_needed

    def body(state):
        i, alive, keep = state
        kept_i = jnp.logical_and(alive[:, i], svalid[:, i])  # (B,)
        keep = keep.at[:, i].set(kept_i)
        suppress = jnp.logical_and(
            kept_i[:, None],
            jnp.logical_and(iou[:, i, :] > iou_threshold, idx[None, :] > i),
        )
        alive = jnp.logical_and(alive, jnp.logical_not(suppress))
        return i + 1, alive, keep

    b = boxes.shape[0]
    alive0 = jnp.ones((b, k), dtype=bool)
    keep0 = jnp.zeros((b, k), dtype=bool)
    _, _, keep_sorted = jax.lax.while_loop(cond, body, (jnp.int32(0), alive0, keep0))

    keep = jnp.zeros((b, k), dtype=bool)
    return keep.at[jnp.arange(b)[:, None], order].set(keep_sorted)


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
