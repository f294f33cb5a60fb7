"""Batched fixed-capacity MTCNN cascade.

The reference runs facenet_pytorch's ``mtcnn.detect(frame)`` one frame at a
time (server/model.py:47): a dynamic pyramid, dynamic candidate counts, and
numpy NMS per image.  This version runs the whole cascade over a *batch* of
frames inside one jit:

- pyramid levels are static (pipeline/pyramid.py) and unrolled, each level an
  MXU area-resize + fully-convolutional P-Net over the batch;
- candidate sets live in fixed-capacity (B, K, ...) tensors with validity
  masks; per-frame NMS is the masked greedy kernel vmapped over the batch;
- R-Net/O-Net stage crops come from the exact integral-image area resampler
  (ops/resize.py), normalized on device.

Numeric conventions preserved from the upstream cascade (so converted public
checkpoints produce the same boxes): (x-127.5)/128 normalization, the
(2x+1)/scale cell-to-box mapping, stage-1 regression without the +1 width,
bbreg/rerec with +1, trunc-clamp crop padding, landmark mapping before the
final regression, and the 'min' NMS mode in stage 3.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from truely_tpu.config import MTCNNConfig
from truely_tpu.models.mtcnn_nets import apply_pnet, apply_rnet, apply_onet
from truely_tpu.ops.boxes import bbreg, rerec, pad_crop_bounds
from truely_tpu.ops.nms import nms_masked_batch, NEG_INF
from truely_tpu.ops.resize import resize_area, integral_image, crop_resize_area
from truely_tpu.pipeline.pyramid import pyramid_schedule


class MTCNNParams(NamedTuple):
    pnet: dict
    rnet: dict
    onet: dict


class Detections(NamedTuple):
    boxes: jax.Array      # (B, K, 4) f32 [x1, y1, x2, y2] image coords
    scores: jax.Array     # (B, K) f32 O-Net probabilities
    landmarks: jax.Array  # (B, K, 5, 2) f32 five-point landmarks
    valid: jax.Array      # (B, K) bool


def _normalize(x: jax.Array) -> jax.Array:
    return (x.astype(jnp.float32) - 127.5) * 0.0078125


def _batched_nms(boxes, scores, valid, iou_threshold, method="union",
                 max_rounds=0):
    return nms_masked_batch(
        boxes, scores, valid, iou_threshold=iou_threshold, method=method,
        max_rounds=max_rounds,
    )


def _topk_gather(scores, valid, k_out, *arrays):
    """Per-frame top-k by masked score. Returns (scores, valid, *gathered)."""
    masked = jnp.where(valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k_out)  # (B, k_out)
    new_valid = vals > NEG_INF / 2
    gathered = []
    for a in arrays:
        if a.ndim == 2:
            gathered.append(jnp.take_along_axis(a, idx, axis=1))
        else:
            expand = idx.reshape(idx.shape + (1,) * (a.ndim - 2))
            gathered.append(jnp.take_along_axis(a, expand, axis=1))
    return (jnp.where(new_valid, vals, 0.0), new_valid, *gathered)


def _stage1(params, frames, cfg: MTCNNConfig, *, dtype, precision):
    """P-Net over the pyramid. Returns (boxes, scores, valid) at
    capacity cfg.pnet_topk_total, regression applied and squared."""
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    levels = pyramid_schedule(h, w, cfg.min_face_size, cfg.scale_factor)
    all_boxes, all_scores, all_regs, all_valid = [], [], [], []
    k_max = 0
    for lvl in levels:
        # Pyramid resample precision follows the net precision: uint8 pixels
        # are exact in bf16, so default (bf16) costs <=0.4% from weight
        # rounding; parity tests pass HIGHEST explicitly.
        scaled = resize_area(
            frames, (lvl.height, lvl.width),
            precision=precision if precision is not None else jax.lax.Precision.DEFAULT,
        )
        prob, reg = apply_pnet(
            params.pnet, _normalize(scaled), dtype=dtype, precision=precision
        )
        hp, wp = prob.shape[1], prob.shape[2]
        k1 = min(cfg.pnet_topk_per_scale, hp * wp)
        k_max = max(k_max, k1)
        flat_p = prob.reshape(b, hp * wp)
        flat_r = reg.reshape(b, hp * wp, 4)
        vals, idx = jax.lax.top_k(flat_p, k1)
        valid = vals >= cfg.thresholds[0]
        ys = (idx // wp).astype(jnp.float32)
        xs = (idx % wp).astype(jnp.float32)
        # Cell -> original-image box: stride 2, cell 12 (upstream mapping).
        q1x = jnp.floor((2.0 * xs + 1.0) / lvl.scale)
        q1y = jnp.floor((2.0 * ys + 1.0) / lvl.scale)
        q2x = jnp.floor((2.0 * xs + 12.0) / lvl.scale)
        q2y = jnp.floor((2.0 * ys + 12.0) / lvl.scale)
        boxes = jnp.stack([q1x, q1y, q2x, q2y], axis=-1)
        regs = jnp.take_along_axis(flat_r, idx[..., None], axis=1)
        all_boxes.append(boxes)
        all_scores.append(vals)
        all_regs.append(regs)
        all_valid.append(valid)

    # Per-scale NMS 0.5: the scales are independent greedy chains, so pad
    # each to a common capacity and run ONE batched loop over (B*S) chains
    # instead of S sequential loops (the cascade's only serial code).
    n_scales = len(levels)

    def pad_to(a, k):
        pad = [(0, 0), (0, k - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, pad)

    pboxes = jnp.stack([pad_to(x, k_max) for x in all_boxes], axis=1)
    pscores = jnp.stack([pad_to(x, k_max) for x in all_scores], axis=1)
    pvalid = jnp.stack([pad_to(x, k_max) for x in all_valid], axis=1)
    keep = _batched_nms(
        pboxes.reshape(b * n_scales, k_max, 4),
        pscores.reshape(b * n_scales, k_max),
        pvalid.reshape(b * n_scales, k_max),
        cfg.nms_thresholds[0],
        max_rounds=cfg.nms_max_rounds,
    ).reshape(b, n_scales, k_max)
    all_valid = [
        jnp.logical_and(v, keep[:, s, : v.shape[1]])
        for s, v in enumerate(all_valid)
    ]

    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    regs = jnp.concatenate(all_regs, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    k_total = min(cfg.pnet_topk_total, boxes.shape[1])
    scores, valid, boxes, regs = _topk_gather(scores, valid, k_total, boxes, regs)
    # Cross-scale NMS 0.7.
    keep = _batched_nms(boxes, scores, valid, cfg.nms_thresholds[1],
                        max_rounds=cfg.nms_max_rounds)
    valid = jnp.logical_and(valid, keep)
    # Stage-1 regression (upstream uses w = x2-x1 with NO +1 here) + square.
    regw = (boxes[..., 2] - boxes[..., 0])[..., None]
    regh = (boxes[..., 3] - boxes[..., 1])[..., None]
    shift = regs * jnp.concatenate([regw, regh, regw, regh], axis=-1)
    boxes = rerec(boxes + shift)
    return boxes, scores, valid


def _stage_crops(integral, boxes, width, height, out_size):
    bounds = pad_crop_bounds(boxes, width, height)
    return crop_resize_area(integral, bounds, out_size)


def detect_faces(
    params: MTCNNParams,
    frames: jax.Array,
    cfg: Optional[MTCNNConfig] = None,
    *,
    dtype=jnp.bfloat16,
    precision=None,
) -> Detections:
    """Run the full cascade on a (B, H, W, 3) uint8 frame batch.

    Channel order is the caller's choice: the reference feeds BGR
    (cv2 decode, server/model.py:47) which ``reference_compat`` preserves.
    """
    cfg = cfg or MTCNNConfig()
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]

    boxes, scores, valid = _stage1(params, frames, cfg, dtype=dtype, precision=precision)

    integral = integral_image(frames)

    # ---- Stage 2: R-Net on 24x24 crops -----------------------------------
    k2 = min(cfg.rnet_capacity, boxes.shape[1])
    scores, valid, boxes = _topk_gather(scores, valid, k2, boxes)
    crops = _stage_crops(integral, boxes, w, h, 24)
    flat = _normalize(crops.reshape(b * k2, 24, 24, 3))
    prob, reg = apply_rnet(params.rnet, flat, dtype=dtype, precision=precision)
    prob = prob.reshape(b, k2)
    reg = reg.reshape(b, k2, 4)
    valid = jnp.logical_and(valid, prob > cfg.thresholds[1])
    scores = prob
    keep = _batched_nms(boxes, scores, valid, cfg.nms_thresholds[2],
                        max_rounds=cfg.nms_max_rounds)
    valid = jnp.logical_and(valid, keep)
    boxes = rerec(bbreg(boxes, reg))

    # ---- Stage 3: O-Net on 48x48 crops ------------------------------------
    k3 = min(cfg.onet_capacity, boxes.shape[1])
    scores, valid, boxes = _topk_gather(scores, valid, k3, boxes)
    crops = _stage_crops(integral, boxes, w, h, 48)
    flat = _normalize(crops.reshape(b * k3, 48, 48, 3))
    prob, reg, lmk = apply_onet(params.onet, flat, dtype=dtype, precision=precision)
    prob = prob.reshape(b, k3)
    reg = reg.reshape(b, k3, 4)
    lmk = lmk.reshape(b, k3, 10)
    valid = jnp.logical_and(valid, prob > cfg.thresholds[2])
    scores = jnp.where(valid, prob, 0.0)
    # Landmarks map through the PRE-regression box with +1 sides and -1 offset.
    wi = boxes[..., 2] - boxes[..., 0] + 1.0
    hi = boxes[..., 3] - boxes[..., 1] + 1.0
    pts_x = wi[..., None] * lmk[..., 0:5] + boxes[..., 0:1] - 1.0
    pts_y = hi[..., None] * lmk[..., 5:10] + boxes[..., 1:2] - 1.0
    landmarks = jnp.stack([pts_x, pts_y], axis=-1)  # (B, K, 5, 2)
    boxes = bbreg(boxes, reg)
    keep = _batched_nms(boxes, scores, valid, cfg.nms_thresholds[3],
                        method="min", max_rounds=cfg.nms_max_rounds)
    valid = jnp.logical_and(valid, keep)

    return Detections(boxes=boxes, scores=scores, landmarks=landmarks, valid=valid)


def select_primary_face(
    det: Detections, *, largest: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick one face per frame: largest area (facenet_pytorch
    select_largest=True — what makes reference model.py:49 ``boxes[0]`` the
    largest face) or highest score.

    Returns (box (B, 4), score (B,), has_face (B,)).
    """
    if largest:
        key = (det.boxes[..., 2] - det.boxes[..., 0]) * (
            det.boxes[..., 3] - det.boxes[..., 1]
        )
    else:
        key = det.scores
    key = jnp.where(det.valid, key, -jnp.inf)
    idx = jnp.argmax(key, axis=1)  # (B,)
    take = lambda a: jnp.take_along_axis(
        a, idx.reshape(idx.shape + (1,) * (a.ndim - 1)), axis=1
    ).squeeze(1)
    return take(det.boxes), take(det.scores), jnp.any(det.valid, axis=1)
