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
from truely_tpu.models.mtcnn_nets import (
    apply_pnet_trunk, apply_pnet_trunk_folded, apply_rnet, apply_onet,
    pnet_reg_from_features,
)
from truely_tpu.ops.fold import fold_width, phase_select
from truely_tpu.ops.boxes import bbreg, rerec, pad_crop_bounds
from truely_tpu.ops.crop_area_fused import (
    crop_resize_area_fused, prep_frames_for_fused_crops,
)
from truely_tpu.ops.crop_fused2 import (
    crop_resize_area_fused2, prep_frames_fused2,
)
from truely_tpu.ops.nms import nms_masked_batch, NEG_INF
from truely_tpu.ops.resize import (
    resize_area, resize_area_u8, crop_resize_area_mxu,
    crop_resize_area_mxu_quant,
)
from truely_tpu.ops.topk import exact_topk_lastdim
from truely_tpu.pipeline.pyramid import pyramid_schedule


# Width-fold factor for the folded P-Net trunk (ops/fold.py): 4 packs the
# trunk's channels to 40/64/128 — MXU-shaped — while keeping the banded
# kernels at 2 blocks wide (FLOP inflation 2*4/3 = 2.67x per 3-tap conv).
PNET_FOLD = 4


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
                 max_rounds=0, groups=None, use_pallas=False):
    if use_pallas and groups is None and jax.default_backend() == "tpu":
        from truely_tpu.ops.nms_pallas import nms_masked_batch_pallas

        return nms_masked_batch_pallas(
            boxes, scores, valid, iou_threshold=iou_threshold, method=method,
            max_rounds=max_rounds,
        )
    return nms_masked_batch(
        boxes, scores, valid, iou_threshold=iou_threshold, method=method,
        max_rounds=max_rounds, groups=groups,
    )


def _topk_gather(scores, valid, k_out, *arrays):
    """Per-frame top-k by masked score. Returns (scores, valid, *gathered).

    Payload arrays are fused into ONE concatenated gather so the selected
    rows move in a single pass regardless of how many tensors ride along.
    """
    masked = jnp.where(valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k_out)  # (B, k_out)
    new_valid = vals > NEG_INF / 2
    if not arrays:
        return jnp.where(new_valid, vals, 0.0), new_valid
    b = scores.shape[0]
    parts = []
    splits = []
    offset = 0
    for a in arrays:
        flat = a.reshape(b, a.shape[1], -1).astype(jnp.float32)
        parts.append(flat)
        offset += flat.shape[-1]
        splits.append(offset)
    payload = jnp.concatenate(parts, axis=-1)  # (B, K_in, sum_widths)
    taken = jnp.take_along_axis(payload, idx[..., None], axis=1)
    gathered = []
    start = 0
    for a, end in zip(arrays, splits):
        piece = taken[..., start:end]
        start = end
        out_shape = (b, k_out) + a.shape[2:]
        piece = piece.reshape(out_shape).astype(a.dtype)
        gathered.append(piece)
    return (jnp.where(new_valid, vals, 0.0), new_valid, *gathered)


def _stage1(params, frames, cfg: MTCNNConfig, *, dtype, precision):
    """P-Net over the pyramid. Returns (boxes, scores, valid) at capacity
    cfg.pnet_topk_total, regression applied and squared.

    Design: ONE global top-k over every cell of every pyramid level, not 12
    per-level candidate streams.  Box coordinates are reconstructed
    arithmetically from the flat cell index (static per-level offsets), and
    regression offsets come from the 1x1 head applied to *gathered* trunk
    features — so the whole-grid work is exactly the trunk + classifier
    convs, and only K cells ever touch the box/regression math.  (The
    12-stream formulation triggered an XLA:TPU fusion/layout pathology:
    multi-minute compiles and a ~40 ms stage on an otherwise sub-ms graph.)
    Per-scale NMS runs on the selected set grouped by level id.
    """
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    levels = pyramid_schedule(h, w, cfg.min_face_size, cfg.scale_factor)
    probs, feats = [], []
    offsets, wps, scales = [], [], []
    offset = 0
    use_i8_resize = (
        precision is None
        and frames.dtype == jnp.uint8
        and jnp.dtype(dtype) == jnp.bfloat16
    )
    # Folded trunk on production paths only: the f32/HIGHEST parity paths
    # keep the direct trunk whose contraction order matches the torch
    # oracles bit-for-bit.
    use_folded = cfg.use_folded_pnet and precision is None
    # Cascaded pyramid on production paths: level l resamples level l-1
    # instead of the full frame, so the per-level contraction shrinks
    # geometrically (21 ms vs 58 ms at 1080p b128 — scripts/probes/
    # probe_resize2.py).  bf16 rounding compounds ~0.4%/level (bounded by
    # tests/test_resize.py::test_pyramid_cascade_drift); parity paths
    # (precision=HIGHEST) keep the exact one-shot resample below.
    # Production means bf16 + default precision, matching use_i8_resize:
    # float32 configs (the golden run, the parity oracles) must keep the
    # exact one-shot resample even when precision isn't passed explicitly.
    use_cascade = (
        cfg.pyramid_cascade
        and precision is None
        and jnp.dtype(dtype) == jnp.bfloat16
    )
    src = frames
    for lvl in levels:
        # Pyramid resample follows the net precision.  The bf16 production
        # path (precision=None) resamples uint8 frames on the int8 MXU
        # (ops/resize.resize_area_u8): 2x the bf16 matmul rate AND exact
        # integer bin sums (the old bf16 two-pass averaged with <=0.4%
        # rounding).  Parity paths pass HIGHEST and keep the float32
        # two-pass that is bit-matched against torch.
        if use_cascade:
            scaled = resize_area(
                src, (lvl.height, lvl.width),
                precision=jax.lax.Precision.DEFAULT, dtype=dtype,
            )
            src = scaled
        elif use_i8_resize:
            scaled = resize_area_u8(frames, (lvl.height, lvl.width))
        else:
            scaled = resize_area(
                frames, (lvl.height, lvl.width),
                precision=precision if precision is not None else jax.lax.Precision.DEFAULT,
                dtype=None if precision is not None else dtype,
            )
        if use_folded:
            # Width-folded trunk (ops/fold.py): slot index == pixel x, so
            # wp is the padded slot count and the flat-cell decode below
            # is unchanged; garbage tail slots carry prob = -1.  The trunk
            # returns the (tiny) folded regression grid instead of trunk
            # features — identical per-cell math, ~30x less HBM.
            prob, reg = apply_pnet_trunk_folded(
                params.pnet, _normalize(fold_width(scaled, PNET_FOLD)),
                lvl.width, fold=PNET_FOLD, dtype=dtype, precision=precision,
            )
            hp, wp = prob.shape[1], prob.shape[2]
            feats.append(
                reg.reshape(b, hp * reg.shape[2], reg.shape[-1])
            )
        else:
            prob, feat = apply_pnet_trunk(
                params.pnet, _normalize(scaled), dtype=dtype,
                precision=precision,
            )
            hp, wp = prob.shape[1], prob.shape[2]
            feats.append(feat.reshape(b, hp * wp, feat.shape[-1]))
        probs.append(prob.reshape(b, hp * wp))
        offsets.append(offset)
        wps.append(wp)
        scales.append(lvl.scale)
        offset += hp * wp

    probs_all = jnp.concatenate(probs, axis=1)   # (B, N)
    k_total = min(cfg.pnet_topk_total, probs_all.shape[1])
    # Exact top-k via chunk-max prefilter: bit-identical to lax.top_k but
    # ~10x faster at the 1.5M-cell 1080p shape (ops/topk.py).
    scores, idx = exact_topk_lastdim(probs_all, k_total)  # (B, K)
    valid = scores >= cfg.thresholds[0]

    # Reconstruct (level, y, x) from the flat index via static tables.
    offs = jnp.asarray(offsets, jnp.int32)       # (L,)
    lvl_id = jnp.searchsorted(offs, idx, side="right").astype(jnp.int32) - 1
    wp_tab = jnp.asarray(wps, jnp.int32)
    scale_tab = jnp.asarray(scales, jnp.float32)
    wp_sel = wp_tab[lvl_id]
    scale_sel = scale_tab[lvl_id]
    cell = idx - offs[lvl_id]
    ys = (cell // wp_sel).astype(jnp.float32)
    xs = (cell % wp_sel).astype(jnp.float32)
    # Cell -> original-image box: stride 2, cell 12 (upstream mapping).
    boxes = jnp.stack(
        [
            jnp.floor((2.0 * xs + 1.0) / scale_sel),
            jnp.floor((2.0 * ys + 1.0) / scale_sel),
            jnp.floor((2.0 * xs + 12.0) / scale_sel),
            jnp.floor((2.0 * ys + 12.0) / scale_sel),
        ],
        axis=-1,
    )
    # Gather the K selected cells' trunk features PER LEVEL: concatenating
    # every level's features first (a (B, ~1.5M, 32) buffer at 1080p) cost
    # ~1.5 GB of copies/dynamic-update-slices per step just to read 256
    # rows back out.  Twelve masked (B, K, 32) gathers touch only what the
    # regression head needs.
    if use_folded:
        # The folded trunk already ran the 1x1 regression head over the
        # grid (identical math); gather the 4 offsets for the K selected
        # cells: slot s lives at folded row s // F, channels (s % F)*4.
        regs = jnp.zeros((b, k_total, 4), jnp.float32)
        for li, f in enumerate(feats):
            flat = idx - offsets[li]
            local = jnp.clip(flat // PNET_FOLD, 0, f.shape[1] - 1)
            g = jnp.take_along_axis(f, local[..., None], axis=1)
            g = phase_select(g, jnp.remainder(flat, PNET_FOLD), 4, PNET_FOLD)
            regs = jnp.where((lvl_id == li)[..., None], g, regs)
    else:
        feat_sel = jnp.zeros(
            (b, k_total, feats[0].shape[-1]), dtype=feats[0].dtype
        )
        for li, f in enumerate(feats):
            local = jnp.clip(idx - offsets[li], 0, f.shape[1] - 1)
            g = jnp.take_along_axis(f, local[..., None], axis=1)
            feat_sel = jnp.where((lvl_id == li)[..., None], g, feat_sel)
        regs = pnet_reg_from_features(
            params.pnet, feat_sel, dtype=dtype, precision=precision
        )

    # Per-scale NMS 0.5: same-level pairs only (grouped), then cross-scale
    # NMS 0.7 over everything.
    keep = _batched_nms(
        boxes, scores, valid, cfg.nms_thresholds[0],
        max_rounds=cfg.nms_max_rounds, groups=lvl_id,
    )
    valid = jnp.logical_and(valid, keep)
    keep = _batched_nms(
        boxes, scores, valid, cfg.nms_thresholds[1],
        max_rounds=cfg.nms_max_rounds, use_pallas=cfg.use_pallas_nms,
    )
    valid = jnp.logical_and(valid, keep)
    # Stage-1 regression (upstream uses w = x2-x1 with NO +1 here) + square.
    regw = (boxes[..., 2] - boxes[..., 0])[..., None]
    regh = (boxes[..., 3] - boxes[..., 1])[..., None]
    shift = regs * jnp.concatenate([regw, regh, regw, regh], axis=-1)
    boxes = rerec(boxes + shift)
    return boxes, scores, valid


def _stage_crops(frames_chw, boxes, width, height, out_size, dtype,
                 frames_fused=None, quant=1):
    """Area crop-resize of stage boxes straight from the uint8 frames.

    MXU bin-indicator matmuls (ops/resize.crop_resize_area_mxu) — bit-exact
    with the integral-image formulation but ~8x faster on TPU, where XLA
    gathers run far below HBM bandwidth.  When ``frames_fused`` (a
    ``(version, prepped planar frames)`` pair) is given, the corresponding
    fused Pallas kernel (v1 ops/crop_area_fused.py, v2 ops/crop_fused2.py)
    computes the same result without the HBM round-trip of the column-sum
    intermediate — also bit-exact.  With
    ``quant > 1`` (production bf16 paths) the boxes snap to a quant-px grid
    and the dots contract the block-mean frame: FLOPs / quant^2 on the
    step's top-2 device ops (ops/resize.crop_resize_area_mxu_quant)."""
    bounds = pad_crop_bounds(boxes, width, height)
    if quant > 1:
        return crop_resize_area_mxu_quant(
            frames_chw, bounds, out_size, quant=quant)
    if frames_fused is not None:
        version, prepped = frames_fused
        fused_fn = (
            crop_resize_area_fused2 if version >= 2 else crop_resize_area_fused
        )
        return fused_fn(prepped, bounds, out_size, src_hw=(height, width))
    return crop_resize_area_mxu(frames_chw, bounds, out_size, dtype=dtype)


def _prep_crop_frames(frames, cfg: MTCNNConfig, *, dtype, precision):
    """Shared crop-source preparation for the R-Net/O-Net stage crops.

    Returns (frames_chw, frames_fused, crop_quant, crop_dtype) — one
    transpose (+ optional Pallas prep) pass reused by both stages and by
    the track-propagated refinement path."""
    # Channel-major uint8 frames shared by both stage-crop extractions
    # (H/W must be the minor dims; C-minor intermediates lane-pad 3 -> 128).
    frames_chw = jnp.transpose(frames, (0, 3, 1, 2))
    crop_dtype = jnp.float32 if precision is not None else dtype
    # Quantized stage crops on production paths only (same gate as the
    # cascaded pyramid): parity/golden configs (f32 or explicit precision)
    # keep the exact full-resolution crops the torch oracles bit-match.
    crop_quant = (
        cfg.stage_crop_quant
        if (
            cfg.stage_crop_quant > 1
            and precision is None
            and jnp.dtype(dtype) == jnp.bfloat16
            and frames.dtype == jnp.uint8
        )
        else 1
    )
    # Prepped planar frames for the fused Pallas crop kernel, shared by
    # both stages (one transpose+shift pass).  TPU-only: interpret-mode
    # Pallas on CPU would be far slower than the XLA matmul path.
    frames_fused = None
    if cfg.use_fused_crops and jax.default_backend() == "tpu":
        version = int(cfg.use_fused_crops)
        prep = prep_frames_fused2 if version >= 2 else prep_frames_for_fused_crops
        frames_fused = (version, prep(frames_chw))
    return frames_chw, frames_fused, crop_quant, crop_dtype


def _stages23(
    params: MTCNNParams,
    prep,
    boxes,
    scores,
    valid,
    cfg: MTCNNConfig,
    *,
    w: int,
    h: int,
    k2: int,
    k3: int,
    dtype,
    precision,
) -> Detections:
    """Stages 2-3 of the cascade (R-Net refine + O-Net score/landmarks) on
    an arbitrary candidate set — the shared tail of full detection and of
    track-propagated refinement, so both paths keep identical semantics
    (thresholds, NMS modes, bbreg/rerec order, landmark mapping)."""
    frames_chw, frames_fused, crop_quant, crop_dtype = prep
    b = frames_chw.shape[0]

    # ---- Stage 2: R-Net on 24x24 crops -----------------------------------
    scores, valid, boxes = _topk_gather(scores, valid, k2, boxes)
    crops = _stage_crops(frames_chw, boxes, w, h, 24, crop_dtype,
                         frames_fused=frames_fused, quant=crop_quant)
    flat = _normalize(crops.reshape(b * k2, 24, 24, 3))
    prob, reg = apply_rnet(params.rnet, flat, dtype=dtype, precision=precision)
    prob = prob.reshape(b, k2)
    reg = reg.reshape(b, k2, 4)
    valid = jnp.logical_and(valid, prob > cfg.thresholds[1])
    scores = prob
    keep = _batched_nms(boxes, scores, valid, cfg.nms_thresholds[2],
                        max_rounds=cfg.nms_max_rounds,
                        use_pallas=cfg.use_pallas_nms)
    valid = jnp.logical_and(valid, keep)
    boxes = rerec(bbreg(boxes, reg))

    # ---- Stage 3: O-Net on 48x48 crops ------------------------------------
    scores, valid, boxes = _topk_gather(scores, valid, k3, boxes)
    crops = _stage_crops(frames_chw, boxes, w, h, 48, crop_dtype,
                         frames_fused=frames_fused, quant=crop_quant)
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
                        method="min", max_rounds=cfg.nms_max_rounds,
                        use_pallas=cfg.use_pallas_nms)
    valid = jnp.logical_and(valid, keep)

    return Detections(boxes=boxes, scores=scores, landmarks=landmarks, valid=valid)


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
    prep = _prep_crop_frames(frames, cfg, dtype=dtype, precision=precision)
    k2 = min(cfg.rnet_capacity, boxes.shape[1])
    return _stages23(
        params, prep, boxes, scores, valid, cfg,
        w=w, h=h, k2=k2, k3=min(cfg.onet_capacity, k2),
        dtype=dtype, precision=precision,
    )


# Track-propagated refinement candidates: concentric squares around the
# seed box at these scales.  Four scales fill the fixed capacity exactly;
# the largest (2x side) tolerates ~0.5 x side of face motion between
# keyframes before the face leaves every candidate, and O-Net's bbreg
# re-localizes within a candidate.  Python floats (never module-level jnp
# constants — PERFORMANCE.md finding 1).
PROPAGATE_SCALES = (1.0, 1.3, 1.65, 2.0)


def refine_faces(
    params: MTCNNParams,
    frames: jax.Array,
    seed_boxes: jax.Array,
    seed_valid: jax.Array,
    cfg: Optional[MTCNNConfig] = None,
    *,
    dtype=jnp.bfloat16,
    precision=None,
) -> Detections:
    """Track-propagated detection: stages 2-3 only, seeded from a known box.

    The reference re-runs the full pyramid + P-Net cascade on every sampled
    frame (/root/reference/server/model.py:47) even when the previous
    frame's face is known and stable — on TPU that is ~2/3 of the frame
    step (pyramid ~19 ms + trunk ~35 ms + selection at 1080p b128) spent
    re-discovering a box we already have.  This entry point replaces
    stage 1 with a fixed candidate set derived from ``seed_boxes`` (the
    most recent keyframe's full detection): concentric squares at
    ``PROPAGATE_SCALES``, scored in descending-scale-free order, then the
    UNCHANGED stage-2/3 machinery (same thresholds, NMS modes, bbreg/rerec
    and landmark semantics via ``_stages23``) refines, re-scores, and can
    reject them.  Frames whose ``seed_valid`` is False yield no detection
    (a face appearing mid-interval is picked up at the next keyframe).

    seed_boxes: (B, 4) f32; seed_valid: (B,) bool — one seed per frame.
    """
    cfg = cfg or MTCNNConfig()
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    c = len(PROPAGATE_SCALES)

    sq = rerec(seed_boxes)
    cx = (sq[..., 0] + sq[..., 2]) * 0.5
    cy = (sq[..., 1] + sq[..., 3]) * 0.5
    side = sq[..., 2] - sq[..., 0]
    cands = []
    for s in PROPAGATE_SCALES:
        half = side * (0.5 * s)
        cands.append(
            jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=-1)
        )
    boxes = jnp.stack(cands, axis=1)  # (B, C, 4)
    valid = jnp.broadcast_to(seed_valid[:, None], (b, c))
    # Descending placeholder scores keep the pre-R-Net top-k gather order
    # deterministic (tightest candidate first); R-Net probabilities replace
    # them immediately after.
    scores = jnp.where(
        valid,
        1.0 - 0.01 * jnp.arange(c, dtype=jnp.float32)[None, :],
        0.0,
    )

    prep = _prep_crop_frames(frames, cfg, dtype=dtype, precision=precision)
    return _stages23(
        params, prep, boxes, scores, valid, cfg,
        w=w, h=h, k2=c, k3=c, dtype=dtype, precision=precision,
    )


def refine_faces_multi(
    params: MTCNNParams,
    frames: jax.Array,
    seed_boxes: jax.Array,
    seed_valid: jax.Array,
    cfg: Optional[MTCNNConfig] = None,
    *,
    dtype=jnp.bfloat16,
    precision=None,
) -> Detections:
    """Track-propagated refinement with T seeds per frame (the multi-face
    config-4 counterpart of ``refine_faces``).

    Each of the T track seeds spawns ``PROPAGATE_SCALES`` concentric square
    candidates — a (B, T*C) candidate set — and the UNCHANGED stage-2/3
    machinery (``_stages23``: same thresholds, NMS modes, bbreg/rerec and
    landmark semantics) refines, re-scores, and cross-suppresses them.
    Candidates of different seeds that converge on the same face merge
    under the ordinary per-frame NMS, exactly as full detection would
    merge them; invalid seed slots contribute nothing.  The reference has
    no tracking at all — it re-runs the full cascade per frame and keeps
    only ``boxes[0]`` (/root/reference/server/model.py:47-49).

    seed_boxes: (B, T, 4) f32; seed_valid: (B, T) bool.
    """
    cfg = cfg or MTCNNConfig()
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    t = seed_boxes.shape[1]
    c = len(PROPAGATE_SCALES)

    sq = rerec(seed_boxes)                       # (B, T, 4)
    cx = (sq[..., 0] + sq[..., 2]) * 0.5
    cy = (sq[..., 1] + sq[..., 3]) * 0.5
    side = sq[..., 2] - sq[..., 0]
    cands = []
    for s in PROPAGATE_SCALES:
        half = side * (0.5 * s)
        cands.append(
            jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=-1)
        )
    boxes = jnp.stack(cands, axis=2).reshape(b, t * c, 4)  # seed-major
    valid = jnp.broadcast_to(seed_valid[:, :, None], (b, t, c)).reshape(
        b, t * c
    )
    # Deterministic pre-R-Net gather order: seed-major, tightest scale
    # first within a seed (same convention as ``refine_faces``).
    scores = jnp.where(
        valid,
        1.0 - 0.01 * jnp.arange(t * c, dtype=jnp.float32)[None, :],
        0.0,
    )

    prep = _prep_crop_frames(frames, cfg, dtype=dtype, precision=precision)
    return _stages23(
        params, prep, boxes, scores, valid, cfg,
        w=w, h=h, k2=t * c, k3=t * c, dtype=dtype, precision=precision,
    )


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
