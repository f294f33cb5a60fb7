"""Box algebra for the detection cascade.

Semantics follow the MTCNN lineage the reference depends on (facenet_pytorch's
``detect_face`` utilities, reached from server/model.py:47): the +1 "MATLAB
pixel" width/height convention in regression and IoU, square re-rectification,
and truncate-then-clamp padding of stage crops.  Everything is batched,
mask-friendly, and jittable (no data-dependent shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbreg(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Apply regression offsets: corners move by reg * (side + 1).

    boxes: (..., 4) [x1, y1, x2, y2]; reg: (..., 4) per-corner offsets.
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return jnp.stack(
        [
            boxes[..., 0] + reg[..., 0] * w,
            boxes[..., 1] + reg[..., 1] * h,
            boxes[..., 2] + reg[..., 2] * w,
            boxes[..., 3] + reg[..., 3] * h,
        ],
        axis=-1,
    )


def rerec(boxes: jnp.ndarray) -> jnp.ndarray:
    """Re-rectify boxes to squares centered on the original box."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    side = jnp.maximum(w, h)
    x1 = boxes[..., 0] + w * 0.5 - side * 0.5
    y1 = boxes[..., 1] + h * 0.5 - side * 0.5
    return jnp.stack([x1, y1, x1 + side, y1 + side], axis=-1)


def pad_crop_bounds(boxes: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Truncate boxes to int and clamp to the image, returning 0-based
    half-open crop bounds (x0, y0, x1, y1) as int32.

    Mirrors the 1-based clamp ``x<1 -> 1 ; ex>w -> w`` followed by the
    0-based slice ``[y-1:ey, x-1:ex]``.
    """
    b = jnp.trunc(boxes).astype(jnp.int32)
    x0 = jnp.maximum(b[..., 0], 1) - 1
    y0 = jnp.maximum(b[..., 1], 1) - 1
    x1 = jnp.minimum(b[..., 2], width)
    y1 = jnp.minimum(b[..., 3], height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def clip_boxes(boxes: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Clamp float boxes into [0, W] x [0, H] (reference model.py:50-53)."""
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, width),
            jnp.clip(boxes[..., 1], 0, height),
            jnp.clip(boxes[..., 2], 0, width),
            jnp.clip(boxes[..., 3], 0, height),
        ],
        axis=-1,
    )


def box_area(boxes: jnp.ndarray, plus_one: bool = True) -> jnp.ndarray:
    off = 1.0 if plus_one else 0.0
    return (boxes[..., 2] - boxes[..., 0] + off) * (boxes[..., 3] - boxes[..., 1] + off)


def iou_matrix(
    boxes: jnp.ndarray,
    *,
    method: str = "union",
    plus_one: bool = True,
) -> jnp.ndarray:
    """Pairwise IoU of (K, 4) boxes -> (K, K).

    ``method='min'`` divides the intersection by the smaller area instead of
    the union (the O-Net final NMS mode).
    """
    off = 1.0 if plus_one else 0.0
    a = boxes[:, None, :]  # (K, 1, 4)
    b = boxes[None, :, :]  # (1, K, 4)
    ix = jnp.maximum(
        0.0,
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + off,
    )
    iy = jnp.maximum(
        0.0,
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + off,
    )
    inter = ix * iy
    area = box_area(boxes, plus_one=plus_one)
    if method == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(denom, 1e-12)
