"""Pallas TPU kernel for the round-parallel NMS fixpoint.

One program per suppression chain (batch row): boxes/scores stream into
VMEM once, the (K, K) IoU and outranking relations are built in-registers,
and the whole keep/suppress fixpoint loop runs on-chip with zero HBM
traffic between rounds.  Semantics identical to ops/nms.nms_masked_batch
(tested equivalent, including the bounded-rounds tail rule).

Layout notes (pallas_guide.md): box coordinates arrive pre-transposed as
(B, 4, K) so K sits on the 128-wide lane dimension; masks are carried as
f32 {0,1} planes shaped (1, K) / (K, K), which the VPU prefers over bools;
K must be a multiple of 128 (the wrapper pads with invalid slots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, valid_ref, keep_ref, *,
                iou_threshold: float, method: str, max_rounds: int,
                plus_one: float):
    k = scores_ref.shape[-1]
    x1 = boxes_ref[0, 0, :].reshape(1, k)
    y1 = boxes_ref[0, 1, :].reshape(1, k)
    x2 = boxes_ref[0, 2, :].reshape(1, k)
    y2 = boxes_ref[0, 3, :].reshape(1, k)
    scores = scores_ref[0, 0, :].reshape(1, k)
    valid = valid_ref[0, 0, :].reshape(1, k)

    col = lambda v: v.reshape(k, 1)  # candidate j (suppressor) on rows
    row = lambda v: v.reshape(1, k)  # candidate i (suppressee) on cols

    ix = jnp.maximum(
        0.0, jnp.minimum(col(x2), row(x2)) - jnp.maximum(col(x1), row(x1)) + plus_one
    )
    iy = jnp.maximum(
        0.0, jnp.minimum(col(y2), row(y2)) - jnp.maximum(col(y1), row(y1)) + plus_one
    )
    inter = ix * iy
    area = (x2 - x1 + plus_one) * (y2 - y1 + plus_one)  # (1, K)
    if method == "min":
        denom = jnp.minimum(col(area), row(area))
    else:
        denom = col(area) + row(area) - inter
    iou = inter / jnp.maximum(denom, 1e-12)

    idx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    idx_t = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    outranks = jnp.logical_or(
        col(scores) > row(scores),
        jnp.logical_and(col(scores) == row(scores), idx < idx_t),
    )
    overlap = jnp.logical_and(iou > iou_threshold, outranks)
    overlap = jnp.logical_and(overlap, col(valid) > 0.5)
    overlap_f = overlap.astype(jnp.float32)  # (K, K), j rows suppress i cols

    kept0 = jnp.zeros((1, k), jnp.float32)
    suppressed0 = 1.0 - valid

    def cond(state):
        r, kept, suppressed = state
        undecided = jnp.max(1.0 - jnp.maximum(kept, suppressed)) > 0.5
        if max_rounds > 0:
            return jnp.logical_and(undecided, r < max_rounds)
        return undecided

    def body(state):
        r, kept, suppressed = state
        undecided = 1.0 - jnp.maximum(kept, suppressed)
        blocker = jnp.maximum(kept, undecided)          # (1, K)
        blocked = jnp.max(overlap_f * blocker.reshape(k, 1), axis=0,
                          keepdims=True)                # (1, K)
        new_kept = undecided * (1.0 - blocked)
        kept = jnp.maximum(kept, new_kept)
        dead = jnp.max(overlap_f * kept.reshape(k, 1), axis=0, keepdims=True)
        suppressed = jnp.maximum(suppressed, undecided * dead)
        return r + 1, kept, suppressed

    _, kept, suppressed = jax.lax.while_loop(
        cond, body, (jnp.int32(0), kept0, suppressed0)
    )
    if max_rounds > 0:
        undecided = 1.0 - jnp.maximum(kept, suppressed)
        dead = jnp.max(overlap_f * kept.reshape(k, 1), axis=0, keepdims=True)
        kept = jnp.maximum(kept, undecided * (1.0 - dead))
    keep_ref[0, 0, :] = kept[0, :] > 0.5


def nms_masked_batch_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    iou_threshold: float,
    method: str = "union",
    max_rounds: int = 0,
    plus_one: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas variant of ops.nms.nms_masked_batch."""
    b, k = scores.shape
    pad = (-k) % 128
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    kp = k + pad
    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (B, 4, K)
    kernel = functools.partial(
        _nms_kernel,
        iou_threshold=float(iou_threshold),
        method=method,
        max_rounds=int(max_rounds),
        plus_one=1.0 if plus_one else 0.0,
    )
    # 2-D operands go in as (B, 1, K): TPU block shapes need the trailing two
    # dims tile-aligned or equal to the array dims.
    keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, kp), jnp.bool_),
        interpret=interpret,
    )(
        boxes_t.reshape(b, 4, kp),
        scores.astype(jnp.float32).reshape(b, 1, kp),
        valid.astype(jnp.float32).reshape(b, 1, kp),
    )
    return keep[:, 0, :k]
