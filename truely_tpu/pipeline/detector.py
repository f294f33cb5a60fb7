"""End-to-end video detector: decode → cascade → embed → scan → score.

This replaces the whole of reference server/model.py ``run()`` (the per-frame
CPU loop, SURVEY.md §3.2) with:

- host decode into sampled-frame batches (media/decode.py, background thread)
- ONE jit per resolution bucket covering MTCNN cascade + face crop +
  Inception-ResNet-v1 embedding for a whole batch of frames
- a second small jit folding each batch into the temporal scan state
  (exactly the reference's resettable run-length counter + cosine test)
- host-side annotation/encode of the output video as batches complete
- the reference's score formula, bit-matched (ops/temporal.weighted_score)

Everything device-side uses fixed shapes; the final partial batch is padded
and masked.  Quirks preserved under ``reference_compat`` (BGR input, 80x80
/255 crops, largest-face selection, trunc-clamp crop) per SURVEY.md §7.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from truely_tpu.config import DetectorConfig
from truely_tpu.media.decode import VideoReader
from truely_tpu.media.encode import VideoWriter
from truely_tpu.media.native import i420_to_bgr_host
from truely_tpu.media.overlay import annotate_frame
from truely_tpu.models.inception_resnet_v1 import apply_inception_resnet_v1
from truely_tpu.models.landmark68 import apply_landmark68
from truely_tpu.models.weights import load_or_init
from truely_tpu.models import (
    init_pnet, init_rnet, init_onet, init_inception_resnet_v1, init_landmark68,
)
from truely_tpu.ops.resize import crop_resize_bilinear
from truely_tpu.ops.temporal import (
    init_temporal_state, temporal_consistency, weighted_score,
)
from truely_tpu.pipeline.mtcnn import (  # noqa: E501
    MTCNNParams, detect_faces, refine_faces, refine_faces_multi,
    select_primary_face,
)


class DetectorParams(NamedTuple):
    mtcnn: MTCNNParams
    facenet: dict
    landmark: dict


class FrameOutputs(NamedTuple):
    """Per-frame device outputs for one batch."""

    box: jax.Array        # (B, 4) f32 raw detector box
    crop_bounds: jax.Array  # (B, 4) i32 clipped int crop actually used
    has_face: jax.Array   # (B,) bool
    embedding: jax.Array  # (B, 512) f32
    landmarks68: jax.Array  # (B, 68, 2) f32 in crop-normalized coords


@dataclass
class FrameRecord:
    frame_index: int
    has_face: bool
    box: Tuple[float, float, float, float]
    annotated: bool
    flagged: bool
    similarity: float
    counter: int


@dataclass
class VideoAnalysis:
    """Result of one video analysis (superset of the reference's int score)."""

    fake_score: int
    frame_count: int
    fps: int
    total_processed: int      # sampled frames analyzed
    flagged_count: int        # reference deep_fake_frame_count
    final_counter: int
    records: List[FrameRecord] = field(default_factory=list)
    timings: Dict[str, float] = field(default_factory=dict)
    output_path: Optional[str] = None
    yuv_ingest: bool = False  # native-YUV ingestion actually engaged

    @property
    def suspicious_frames(self) -> List[int]:
        return [r.frame_index for r in self.records if r.flagged]


def _crop_fn(cfg: DetectorConfig):
    if cfg.use_pallas_crop and jax.default_backend() == "tpu":
        from truely_tpu.ops.crop_pallas import crop_resize_bilinear_pallas

        return crop_resize_bilinear_pallas
    return crop_resize_bilinear


def _embed_tail(params: DetectorParams, frames: jax.Array, box: jax.Array,
                has_face: jax.Array, cfg: DetectorConfig,
                compute_dtype) -> FrameOutputs:
    """Shared per-frame tail after a box is known: reference crop semantics
    (model.py:49-56: trunc to int, clamp to the frame, non-degenerate),
    80x80 crop, normalization, FaceNet embedding + landmark head."""
    h, w = frames.shape[1], frames.shape[2]
    bi = box.astype(jnp.int32)
    x0 = jnp.maximum(bi[:, 0], 0)
    y0 = jnp.maximum(bi[:, 1], 0)
    x1 = jnp.minimum(bi[:, 2], w)
    y1 = jnp.minimum(bi[:, 3], h)
    ok = jnp.logical_and(x1 > x0, y1 > y0)
    has_face = jnp.logical_and(has_face, ok)
    bounds = jnp.stack([x0, y0, x1, y1], axis=-1)
    crops = _crop_fn(cfg)(frames, bounds[:, None, :], cfg.crop_size)[:, 0]
    if cfg.reference_compat:
        # torchvision to_tensor scaling, no standardization (model.py:58).
        crops = crops * (1.0 / 255.0)
    else:
        # FaceNet's fixed image standardization (what the embedder was
        # actually trained with; corrected mode).
        crops = (crops - 127.5) * (1.0 / 128.0)
    emb = apply_inception_resnet_v1(params.facenet, crops, dtype=compute_dtype)
    lmk = apply_landmark68(params.landmark, crops, dtype=compute_dtype)
    return FrameOutputs(
        box=box, crop_bounds=bounds, has_face=has_face,
        embedding=emb, landmarks68=lmk,
    )


def _frame_step(params: DetectorParams, frames: jax.Array, cfg: DetectorConfig,
                compute_dtype) -> FrameOutputs:
    det = detect_faces(params.mtcnn, frames, cfg.mtcnn, dtype=compute_dtype)
    box, _score, has_face = select_primary_face(
        det, largest=cfg.mtcnn.select_largest
    )
    return _embed_tail(params, frames, box, has_face, cfg, compute_dtype)


def _frame_step_detect(params: DetectorParams, frames: jax.Array,
                       cfg: DetectorConfig, compute_dtype):
    """Cascade-only seed step for the gathered-keyframe batch
    (cfg.detect_interval > 1): the propagate orchestration consumes ONLY
    (box, has_face) from the keyframe batch — every keyframe row's
    embedding is produced by its segment's refine step, whose seed
    passthrough runs the identical boxes through the shared embed tail —
    so the seed step skips the FaceNet/landmark tail entirely instead of
    computing embeddings that are discarded.  The tail's clamp-degeneracy
    gate on has_face IS reproduced (a box that clamps to nothing inside
    the frame is not a face — _embed_tail applies the same AND), so
    (box, has_face) equals the full step's bit for bit (pinned by
    test_detect_only_seed_step_matches_full_step)."""
    det = detect_faces(params.mtcnn, frames, cfg.mtcnn, dtype=compute_dtype)
    box, _score, has_face = select_primary_face(
        det, largest=cfg.mtcnn.select_largest
    )
    h, w = frames.shape[1], frames.shape[2]
    bi = box.astype(jnp.int32)
    ok = jnp.logical_and(
        jnp.minimum(bi[:, 2], w) > jnp.maximum(bi[:, 0], 0),
        jnp.minimum(bi[:, 3], h) > jnp.maximum(bi[:, 1], 0),
    )
    return box, jnp.logical_and(has_face, ok)


def _frame_step_detect_yuv(params: DetectorParams, packed: jax.Array,
                           cfg: DetectorConfig, compute_dtype):
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _frame_step_detect(params, frames, cfg, compute_dtype)


def _frame_step_propagate(params: DetectorParams, frames: jax.Array,
                          seed_boxes: jax.Array, seed_valid: jax.Array,
                          cfg: DetectorConfig, compute_dtype,
                          k: Optional[int] = None) -> FrameOutputs:
    """Track-propagated frame step (cfg.detect_interval = K > 1): frames is
    a chronological batch of B sampled frames whose every K-th frame is a
    keyframe; ``seed_boxes``/``seed_valid`` hold the (B/K,) keyframe
    detections from the full-cascade seed step.  Keyframes pass their seed
    straight through (their seed IS their own full detection, so their
    outputs are bit-identical to full-detection mode); the frames between
    run seeded R-Net/O-Net refinement only (pipeline/mtcnn.refine_faces).
    ``k`` overrides the config interval (the adaptive "auto" ladder jits
    one executable per rung)."""
    k = k if k is not None else cfg.detect_interval
    b = frames.shape[0]
    sb = jnp.repeat(seed_boxes, k, axis=0)          # (B, 4)
    sv = jnp.repeat(seed_valid, k, axis=0)          # (B,)
    det = refine_faces(
        params.mtcnn, frames, sb, sv, cfg.mtcnn, dtype=compute_dtype
    )
    box, _score, ok = select_primary_face(det, largest=cfg.mtcnn.select_largest)
    is_kf = (jnp.arange(b) % k) == 0
    box = jnp.where(is_kf[:, None], sb, box)
    has_face = jnp.where(is_kf, sv, ok)
    return _embed_tail(params, frames, box, has_face, cfg, compute_dtype)


def _frame_step_propagate_yuv(params: DetectorParams, packed: jax.Array,
                              seed_boxes: jax.Array, seed_valid: jax.Array,
                              cfg: DetectorConfig, compute_dtype,
                              k: Optional[int] = None) -> FrameOutputs:
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _frame_step_propagate(
        params, frames, seed_boxes, seed_valid, cfg, compute_dtype, k=k
    )


def _frame_step_refine(params: DetectorParams, frames: jax.Array,
                       seed_boxes: jax.Array, seed_valid: jax.Array,
                       cfg: DetectorConfig, compute_dtype,
                       rows_per_seed: int) -> FrameOutputs:
    """Seeded refinement of EVERY row (the StreamScheduler's propagate
    step, cfg.detect_interval = K > 1): frames is (S * rows_per_seed, ...)
    grouped per stream, ``seed_boxes``/``seed_valid`` are each stream's
    carried track seed (S,).  Unlike ``_frame_step_propagate`` there are
    no keyframe rows here — keyframes are whole scheduler STEPS (every
    K-th), so every row runs the full stage-2/3 re-scoring and a stale
    seed is re-checked (and can be rejected) on every sampled frame."""
    sb = jnp.repeat(seed_boxes, rows_per_seed, axis=0)
    sv = jnp.repeat(seed_valid, rows_per_seed, axis=0)
    det = refine_faces(
        params.mtcnn, frames, sb, sv, cfg.mtcnn, dtype=compute_dtype
    )
    box, _score, ok = select_primary_face(det, largest=cfg.mtcnn.select_largest)
    return _embed_tail(params, frames, box, ok, cfg, compute_dtype)


def _frame_step_refine_yuv(params: DetectorParams, packed: jax.Array,
                           seed_boxes: jax.Array, seed_valid: jax.Array,
                           cfg: DetectorConfig, compute_dtype,
                           rows_per_seed: int) -> FrameOutputs:
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _frame_step_refine(
        params, frames, seed_boxes, seed_valid, cfg, compute_dtype,
        rows_per_seed,
    )


def _frame_step_yuv(params: DetectorParams, packed: jax.Array,
                    cfg: DetectorConfig, compute_dtype) -> FrameOutputs:
    """The frame step on packed I420 input (B, H*3//2, W) uint8: the exact
    cv2/swscale colorspace conversion (ops/yuv.py) runs on-device as the
    first fused stage, so outputs are bit-identical to the BGR-upload path
    while the host→device transfer moves half the bytes."""
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _frame_step(params, frames, cfg, compute_dtype)


def _multiface_step_yuv(params: DetectorParams, packed: jax.Array,
                        cfg: DetectorConfig, compute_dtype):
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _multiface_step(params, frames, cfg, compute_dtype)


def _multiface_select(det, t: int):
    """Top-``t`` detections per frame by box area (the multi-face
    counterpart of ``select_primary_face``'s largest-first rule)."""
    area = (det.boxes[..., 2] - det.boxes[..., 0]) * (
        det.boxes[..., 3] - det.boxes[..., 1]
    )
    key = jnp.where(det.valid, area, -jnp.inf)
    _, idx = jax.lax.top_k(key, t)  # (B, T)
    boxes = jnp.take_along_axis(det.boxes, idx[..., None], axis=1)
    valid = jnp.take_along_axis(det.valid, idx, axis=1)
    return boxes, valid


def _multiface_step(params: DetectorParams, frames: jax.Array,
                    cfg: DetectorConfig, compute_dtype):
    """Embed the top-``max_tracks`` faces per frame (BASELINE config 4).

    Returns (boxes (B, T, 4) f32, valid (B, T), embeddings (B, T, 512))."""
    det = detect_faces(params.mtcnn, frames, cfg.mtcnn, dtype=compute_dtype)
    boxes, valid = _multiface_select(det, cfg.max_tracks)
    return _multiface_tail(params, frames, boxes, valid, cfg, compute_dtype)


def _multiface_detect(params: DetectorParams, frames: jax.Array,
                      cfg: DetectorConfig, compute_dtype):
    """Cascade-only multi-face seed step (cfg.detect_interval > 1): the
    keyframe gather needs only (boxes, valid) — keyframe rows are
    re-embedded bit-identically by the refine step's seed passthrough
    through the shared ``_multiface_tail`` — so the per-macro-cycle
    keyframe batch skips the T-crop FaceNet/landmark tail (advisor r4:
    the full step's (B, T, 512) embeddings were computed and discarded).
    ``_multiface_tail``'s clamp-degeneracy gate on valid is reproduced so
    (boxes, valid) equals the full step's bit for bit."""
    det = detect_faces(params.mtcnn, frames, cfg.mtcnn, dtype=compute_dtype)
    boxes, valid = _multiface_select(det, cfg.max_tracks)
    h, w = frames.shape[1], frames.shape[2]
    bi = boxes.astype(jnp.int32)
    ok = jnp.logical_and(
        jnp.minimum(bi[..., 2], w) > jnp.maximum(bi[..., 0], 0),
        jnp.minimum(bi[..., 3], h) > jnp.maximum(bi[..., 1], 0),
    )
    return boxes, jnp.logical_and(valid, ok)


def _multiface_detect_yuv(params: DetectorParams, packed: jax.Array,
                          cfg: DetectorConfig, compute_dtype):
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _multiface_detect(params, frames, cfg, compute_dtype)


def _multiface_step_propagate(params: DetectorParams, frames: jax.Array,
                              seed_boxes: jax.Array, seed_valid: jax.Array,
                              cfg: DetectorConfig, compute_dtype,
                              k: Optional[int] = None):
    """Track-propagated multi-face step (cfg.detect_interval = K > 1):
    frames is a chronological batch whose every K-th frame is a keyframe;
    ``seed_boxes`` (B/K, T, 4) / ``seed_valid`` (B/K, T) hold the keyframe
    full detections (the full step's own post-selection outputs).
    Keyframes pass their seeds straight through — their seed IS their own
    full detection, so keyframe rows are bit-identical to full mode —
    and the frames between run T-seed stage-2/3 refinement only
    (pipeline/mtcnn.refine_faces_multi).  ``k`` overrides the config
    interval (the adaptive "auto" ladder — one executable per rung)."""
    k = k if k is not None else cfg.detect_interval
    b = frames.shape[0]
    sb = jnp.repeat(seed_boxes, k, axis=0)          # (B, T, 4)
    sv = jnp.repeat(seed_valid, k, axis=0)          # (B, T)
    det = refine_faces_multi(
        params.mtcnn, frames, sb, sv, cfg.mtcnn, dtype=compute_dtype
    )
    boxes, valid = _multiface_select(det, cfg.max_tracks)
    is_kf = (jnp.arange(b) % k) == 0
    boxes = jnp.where(is_kf[:, None, None], sb, boxes)
    valid = jnp.where(is_kf[:, None], sv, valid)
    return _multiface_tail(params, frames, boxes, valid, cfg, compute_dtype)


def _multiface_step_refine(params: DetectorParams, frames: jax.Array,
                           seed_boxes: jax.Array, seed_valid: jax.Array,
                           cfg: DetectorConfig, compute_dtype,
                           rows_per_seed: int):
    """Seeded multi-face refinement of EVERY row (the StreamScheduler's
    multi-face propagate step, cfg.detect_interval = K > 1): frames is
    (S * rows_per_seed, ...) grouped per stream; ``seed_boxes`` (S, T, 4) /
    ``seed_valid`` (S, T) are each stream's carried per-track seeds.  Like
    the single-face ``_frame_step_refine`` there are no keyframe rows —
    keyframes are whole scheduler STEPS — so every row runs the full T-seed
    stage-2/3 re-scoring (pipeline/mtcnn.refine_faces_multi) and stale
    seeds are re-checked (and can be rejected) on every sampled frame."""
    sb = jnp.repeat(seed_boxes, rows_per_seed, axis=0)   # (S*F, T, 4)
    sv = jnp.repeat(seed_valid, rows_per_seed, axis=0)   # (S*F, T)
    det = refine_faces_multi(
        params.mtcnn, frames, sb, sv, cfg.mtcnn, dtype=compute_dtype
    )
    boxes, valid = _multiface_select(det, cfg.max_tracks)
    return _multiface_tail(params, frames, boxes, valid, cfg, compute_dtype)


def _multiface_step_refine_yuv(params: DetectorParams, packed: jax.Array,
                               seed_boxes: jax.Array, seed_valid: jax.Array,
                               cfg: DetectorConfig, compute_dtype,
                               rows_per_seed: int):
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _multiface_step_refine(
        params, frames, seed_boxes, seed_valid, cfg, compute_dtype,
        rows_per_seed,
    )


def _multiface_step_propagate_yuv(params: DetectorParams, packed: jax.Array,
                                  seed_boxes: jax.Array,
                                  seed_valid: jax.Array,
                                  cfg: DetectorConfig, compute_dtype,
                                  k: Optional[int] = None):
    from truely_tpu.ops.yuv import i420_convert

    frames = i420_convert(packed, rgb=not cfg.reference_compat,
                          use_pallas=cfg.yuv_pallas)
    return _multiface_step_propagate(
        params, frames, seed_boxes, seed_valid, cfg, compute_dtype, k=k
    )


def _multiface_tail(params: DetectorParams, frames: jax.Array,
                    boxes: jax.Array, valid: jax.Array,
                    cfg: DetectorConfig, compute_dtype):
    """Clip, crop, and embed the selected (B, T) face boxes — the shared
    tail of the full and track-propagated multi-face steps (so keyframe
    rows of the propagate step reproduce the full step bit for bit)."""
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    t = boxes.shape[1]
    bi = boxes.astype(jnp.int32)
    x0 = jnp.maximum(bi[..., 0], 0)
    y0 = jnp.maximum(bi[..., 1], 0)
    x1 = jnp.minimum(bi[..., 2], w)
    y1 = jnp.minimum(bi[..., 3], h)
    valid = jnp.logical_and(valid, jnp.logical_and(x1 > x0, y1 > y0))
    bounds = jnp.stack([x0, y0, x1, y1], axis=-1)  # (B, T, 4)
    crops = _crop_fn(cfg)(frames, bounds, cfg.crop_size)  # (B, T, S, S, 3)
    s = cfg.crop_size
    flat = crops.reshape(b * t, s, s, 3)
    flat = (
        flat * (1.0 / 255.0)
        if cfg.reference_compat
        else (flat - 127.5) * (1.0 / 128.0)
    )
    emb = apply_inception_resnet_v1(
        params.facenet, flat, dtype=compute_dtype
    ).reshape(b, t, -1)
    return boxes.astype(jnp.float32), valid, emb


def _temporal_step(emb, has_face, n_valid, state, cfg: DetectorConfig):
    return temporal_consistency(
        emb, has_face, n_valid, state=state,
        similarity_threshold=cfg.similarity_threshold,
        run_length_threshold=cfg.run_length_threshold,
    )


class _MemSegment(NamedTuple):
    """Minimal segment for the in-memory frame paths — just what the
    upload/propagate orchestration reads (``sampled``, ``n_valid``)."""

    sampled: np.ndarray
    n_valid: int


def _upload_segments(seg_iter, depth: int = 2, sharding=None):
    """Async H2D double-buffering: yield (segment, device_frames) pairs
    while keeping up to ``depth`` segments' uploads in flight.

    ``jax.device_put`` is asynchronous — it returns immediately with the
    copy enqueued — so issuing segment N+1's upload before the host blocks
    on segment N's results overlaps the transfer with device compute
    (SURVEY §7 step 1: the decode thread fills pinned staging buffers, this
    keeps the upload pipe full).  On tunnel-attached rigs the upload is the
    dominant end-to-end cost, so the overlap is load-bearing.
    """
    from collections import deque

    q: "deque" = deque()
    for seg in seg_iter:
        q.append((seg, jax.device_put(seg.sampled, sharding)))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


class _AnnotateWorker:
    """Annotate+encode on a dedicated worker thread.

    x264/cv2 encoding releases the GIL, so the worker overlaps the main
    thread's H2D-upload/fetch waits and the decode thread — on a
    remote-attached TPU the tunnel wait is exactly when the host core is
    otherwise idle.  All JAX calls stay on the caller's thread; the worker
    is fed already-fetched numpy arrays via ``submit``.  A failure inside
    ``fn`` (disk full, codec error) is captured, the queue drains, and the
    first error is re-raised by the caller after ``shutdown()`` — promptly,
    never a hang."""

    def __init__(self, fn):
        self._fn = fn
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self.err: List[BaseException] = []
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self.err:
                continue  # drain remaining items after a failure
            try:
                self._fn(*item)
            except BaseException as e:  # propagate to the caller
                self.err.append(e)

    def submit(self, *item):
        self._q.put(item)

    def shutdown(self):
        """Flush and join.  Does NOT raise (safe inside ``finally``);
        check ``err`` afterwards."""
        self._q.put(None)
        self._t.join()


def _enable_compilation_cache() -> None:
    """Persistent compile cache: the unrolled 1080p cascade graph takes
    minutes to compile cold (remote-compile TPU toolchain), seconds warm."""
    import os

    cache_dir = os.environ.get(
        "TRUELY_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/truely_tpu_xla")
    )
    try:
        if jax.default_backend() == "cpu":
            return  # CPU compiles fast; AOT cache entries aren't portable
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort


class Detector:
    """The flagship model/pipeline object.

    Holds converted (or seeded-fallback) weights on device and a per-shape
    cache of compiled steps; resolution buckets compile once and are reused
    across videos/streams.
    """

    def __init__(
        self,
        config: Optional[DetectorConfig] = None,
        weights_dir: Optional[str] = None,
        mesh=None,
        data_axis: str = "data",
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — every batch step then
        runs DP-sharded over ``data_axis`` (frames split across chips,
        params replicated, XLA inserting the collectives), so analyze_video
        / multiface / CLI scale to a slice by constructing the Detector
        with a mesh and nothing else changes."""
        _enable_compilation_cache()
        self.config = config or DetectorConfig()
        di = self.config.detect_interval
        # detect_interval: a fixed int K, or "auto" (adaptive ladder up to
        # auto_interval_max).  self._detect_k is the normalized fixed
        # interval (None in auto mode).
        self._auto_interval = di == "auto"
        if self._auto_interval:
            kmax = self.config.auto_interval_max
            if kmax < 2 or (kmax & (kmax - 1)):
                raise ValueError(
                    f"auto_interval_max must be a power of two >= 2, "
                    f"got {kmax}"
                )
            if self.config.frame_batch % kmax:
                raise ValueError(
                    f"frame_batch ({self.config.frame_batch}) must be "
                    f"divisible by auto_interval_max ({kmax})"
                )
            self._detect_k = None
        else:
            if not isinstance(di, int) or di < 1:
                raise ValueError(
                    f'detect_interval must be an int >= 1 or "auto", '
                    f"got {di!r}"
                )
            if di > 1 and self.config.frame_batch % di:
                raise ValueError(
                    f"frame_batch ({self.config.frame_batch}) must be "
                    f"divisible by detect_interval ({di}) — keyframes "
                    f"batch across {di} segments at frame_batch/{di} per "
                    f"segment"
                )
            self._detect_k = di
        if self.config.draw_mode not in ("all", "flagged-only"):
            raise ValueError(
                f"draw_mode must be 'all' or 'flagged-only', got "
                f"{self.config.draw_mode!r}"
            )
        # Adaptive-keyframing telemetry (auto mode): segments run through
        # full detection vs seeded refinement, and the final ladder rung.
        self.auto_keyframe_segments = 0
        self.auto_refine_segments = 0
        self.auto_interval_current = 1
        self.mesh = mesh
        self._data_axis = data_axis
        self._frames_sharding = None
        self._sharded_cache: dict = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_dp = mesh.shape[data_axis]
            if self.config.frame_batch % n_dp:
                raise ValueError(
                    f"frame_batch ({self.config.frame_batch}) must be "
                    f"divisible by the '{data_axis}' mesh axis ({n_dp})"
                )
            self._frames_sharding = NamedSharding(
                mesh, PartitionSpec(data_axis)
            )
            self._params_sharding = NamedSharding(mesh, PartitionSpec())
        pnet, _ = load_or_init("pnet", init_pnet, weights_dir)
        rnet, _ = load_or_init("rnet", init_rnet, weights_dir)
        onet, _ = load_or_init("onet", init_onet, weights_dir)
        facenet, self.facenet_pretrained = load_or_init(
            "facenet", init_inception_resnet_v1, weights_dir
        )
        landmark, _ = load_or_init("landmark68", init_landmark68, weights_dir)
        params = DetectorParams(
            mtcnn=MTCNNParams(pnet=pnet, rnet=rnet, onet=onet),
            facenet=facenet,
            landmark=landmark,
        )
        self.params = (
            jax.device_put(params)
            if mesh is None
            else jax.device_put(params, self._params_sharding)
        )
        self._compute_dtype = jnp.dtype(self.config.compute_dtype)
        self._step = jax.jit(
            partial(
                _frame_step, cfg=self.config, compute_dtype=self._compute_dtype
            ),
            **(
                {}
                if mesh is None
                else {"in_shardings": (None, self._frames_sharding)}
            ),
        )
        # Single source of truth for the embedding width (the reference's
        # 512-d FaceNet output, server/model.py:59) — derived from the
        # loaded weights so every temporal-state constructor stays in sync
        # with whatever checkpoint is actually installed.
        self.embedding_dim = int(facenet["last_linear"]["w"].shape[-1])
        self._temporal = jax.jit(partial(_temporal_step, cfg=self.config))
        self._score = jax.jit(
            partial(
                weighted_score,
                run_length_threshold=self.config.run_length_threshold,
                long_video_seconds=self.config.long_video_seconds,
            )
        )

    # ------------------------------------------------------------------

    def warmup(self, height: int, width: int) -> None:
        """Pre-compile the resolution bucket (first compile is slow).

        Compiles the graphs ``run()`` will actually use: the multiface
        step/track jits when ``config.multi_face``, else the single-face
        step + temporal fold."""
        b = self.config.frame_batch
        frames = jnp.zeros((b, height, width, 3), jnp.uint8)
        if self.config.yuv_ingest and height % 4 == 0 and width % 2 == 0:
            # Also pre-compile the packed-I420 step (the default ingestion
            # for eligible streams) — but only when the native decoder is
            # actually present, so rigs without it don't pay a dead compile.
            try:
                from truely_tpu.media import videodec  # noqa: F401

                packed = jnp.zeros((b, height * 3 // 2, width), jnp.uint8)
                if self.config.multi_face:
                    jax.block_until_ready(
                        self._ensure_mstep_yuv()(self.params, packed)
                    )
                    if self._detect_k and self._detect_k > 1:
                        bk = b // self._detect_k
                        t = self.config.max_tracks
                        jax.block_until_ready(
                            self._ensure_mprop_step(True)(
                                self.params, packed,
                                jnp.zeros((bk, t, 4), jnp.float32),
                                jnp.zeros((bk, t), bool),
                            )
                        )
                        jax.block_until_ready(
                            self._ensure_mdetect_step(True)(
                                self.params, packed
                            )
                        )
                else:
                    jax.block_until_ready(
                        self._ensure_yuv_step()(self.params, packed)
                    )
                    if self._detect_k and self._detect_k > 1:
                        bk = b // self._detect_k
                        jax.block_until_ready(
                            self._ensure_propagate_step(True)(
                                self.params, packed,
                                jnp.zeros((bk, 4), jnp.float32),
                                jnp.zeros((bk,), bool),
                            )
                        )
                        jax.block_until_ready(
                            self._ensure_detect_step(True)(
                                self.params, packed
                            )
                        )
            except ImportError:
                pass
        if self.config.multi_face:
            from truely_tpu.pipeline.tracks import init_track_state

            self._ensure_track_jits()
            boxes, valid, emb = self._mstep(self.params, frames)
            if self._detect_k and self._detect_k > 1:
                bk = b // self._detect_k
                t = self.config.max_tracks
                jax.block_until_ready(
                    self._ensure_mprop_step(False)(
                        self.params, frames,
                        jnp.zeros((bk, t, 4), jnp.float32),
                        jnp.zeros((bk, t), bool),
                    )
                )
                jax.block_until_ready(
                    self._ensure_mdetect_step(False)(self.params, frames)
                )
            state = init_track_state(self.config.max_tracks, emb.shape[-1])
            state, outs = self._track_fold(
                state, boxes, valid, emb, jnp.int32(b)
            )
            scores = self._track_scores(state, jnp.int32(b), jnp.int32(30))
            jax.block_until_ready((outs, scores))
            return
        out = self._step(self.params, frames)
        if self._detect_k and self._detect_k > 1:
            bk = b // self._detect_k
            jax.block_until_ready(
                self._ensure_propagate_step(False)(
                    self.params, frames,
                    jnp.zeros((bk, 4), jnp.float32),
                    jnp.zeros((bk,), bool),
                )
            )
            jax.block_until_ready(
                self._ensure_detect_step(False)(self.params, frames)
            )
        state = init_temporal_state(out.embedding.shape[-1])
        res = self._temporal(out.embedding, out.has_face, jnp.int32(b), state)
        score = self._score(
            jnp.int32(0), jnp.int32(0), jnp.int32(1), jnp.int32(1), jnp.int32(30)
        )
        jax.block_until_ready((out, res, score))

    def _ensure_yuv_step(self):
        """Lazily-jitted packed-I420 frame step (compiled only on paths
        that actually ingest YUV, so BGR-only runs never pay the extra
        bucket compile)."""
        if not hasattr(self, "_step_yuv"):
            self._step_yuv = jax.jit(
                partial(
                    _frame_step_yuv, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                ),
                **(
                    {}
                    if self.mesh is None
                    else {"in_shardings": (None, self._frames_sharding)}
                ),
            )
        return self._step_yuv

    def _ensure_detect_step(self, yuv: bool):
        """Lazily-jitted cascade-only seed step for the gathered-keyframe
        batch (detect_interval > 1) — the full step minus the embed tail,
        since the orchestration consumes only its (box, has_face)."""
        if not hasattr(self, "_detect_cache"):
            self._detect_cache = {}
        if yuv not in self._detect_cache:
            fn = _frame_step_detect_yuv if yuv else _frame_step_detect
            self._detect_cache[yuv] = jax.jit(
                partial(
                    fn, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                ),
                **(
                    {}
                    if self.mesh is None
                    else {"in_shardings": (None, self._frames_sharding)}
                ),
            )
        return self._detect_cache[yuv]

    def _ensure_mdetect_step(self, yuv: bool):
        """Lazily-jitted cascade-only MULTI-FACE seed step (the keyframe
        gather of ``_propagate_m_outputs`` — boxes/valid only, no T-crop
        embed tail)."""
        if not hasattr(self, "_mdetect_cache"):
            self._mdetect_cache = {}
        if yuv not in self._mdetect_cache:
            fn = _multiface_detect_yuv if yuv else _multiface_detect
            self._mdetect_cache[yuv] = jax.jit(
                partial(
                    fn, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                ),
                **(
                    {}
                    if self.mesh is None
                    else {"in_shardings": (None, self._frames_sharding)}
                ),
            )
        return self._mdetect_cache[yuv]

    def _ensure_propagate_step(self, yuv: bool, k: Optional[int] = None):
        """Lazily-jitted track-propagated refinement step (compiled only
        when detect_interval > 1 paths actually run).  ``k`` selects an
        explicit interval (the adaptive "auto" ladder — one cached
        executable per (yuv, rung)); default: the config's fixed
        interval."""
        if not hasattr(self, "_prop_cache"):
            self._prop_cache = {}
        key = (yuv, k)
        if key not in self._prop_cache:
            fn = _frame_step_propagate_yuv if yuv else _frame_step_propagate
            self._prop_cache[key] = jax.jit(
                partial(
                    fn, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                    **({} if k is None else {"k": k}),
                ),
                **(
                    {}
                    if self.mesh is None
                    # frames DP-sharded; the (B/K,) seeds are tiny and
                    # replicated — XLA selects each shard's slice.
                    else {
                        "in_shardings": (
                            None, self._frames_sharding, None, None
                        )
                    }
                ),
            )
        return self._prop_cache[key]

    def _ensure_stream_refine_step(self, yuv: bool, rows_per_seed: int):
        """Lazily-jitted all-rows seeded refinement step (the
        StreamScheduler's propagate mode; one jit per (yuv, rows_per_seed),
        cached on the detector so N schedulers share the executable)."""
        if not hasattr(self, "_srefine_cache"):
            self._srefine_cache = {}
        key = (yuv, rows_per_seed)
        if key not in self._srefine_cache:
            fn = _frame_step_refine_yuv if yuv else _frame_step_refine
            self._srefine_cache[key] = jax.jit(
                partial(
                    fn, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                    rows_per_seed=rows_per_seed,
                ),
                **(
                    {}
                    if self.mesh is None
                    # frames DP-sharded; the (S,) seeds are tiny and
                    # replicated — XLA selects each shard's slice.
                    else {
                        "in_shardings": (
                            None, self._frames_sharding, None, None
                        )
                    }
                ),
            )
        return self._srefine_cache[key]

    def _ensure_stream_mrefine_step(self, yuv: bool, rows_per_seed: int):
        """Lazily-jitted all-rows MULTI-FACE seeded refinement step (the
        StreamScheduler's multi-face propagate mode; one jit per
        (yuv, rows_per_seed), cached so N schedulers share the
        executable).  Seeds are (S, T, 4) boxes / (S, T) valid — each
        stream's carried per-track seeds."""
        if not hasattr(self, "_smrefine_cache"):
            self._smrefine_cache = {}
        key = (yuv, rows_per_seed)
        if key not in self._smrefine_cache:
            fn = _multiface_step_refine_yuv if yuv else _multiface_step_refine
            self._smrefine_cache[key] = jax.jit(
                partial(
                    fn, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                    rows_per_seed=rows_per_seed,
                ),
                **(
                    {}
                    if self.mesh is None
                    # frames DP-sharded; the (S, T) seeds are tiny and
                    # replicated — XLA selects each shard's slice.
                    else {
                        "in_shardings": (
                            None, self._frames_sharding, None, None
                        )
                    }
                ),
            )
        return self._smrefine_cache[key]

    def _propagate_outputs(self, pair_iter, step, refine, seed_step):
        """Yield (segment, FrameOutputs) chronologically with full detection
        only on keyframes (config.detect_interval = K > 1).

        Orchestration: consume K uploaded segments per cycle; host-gather
        their keyframes (every K-th sampled row) into ONE full-width batch
        for the seed step — a (B/K)-frame cascade would lane-pad ~Kx, since
        batch is the 128-lane minor dim (PERFORMANCE.md finding 6), so
        keyframes batch ACROSS segments to keep stage 1 at full lane
        efficiency.  Each segment then runs the cheap refinement step
        seeded by its slice of the keyframe detections.  With
        ``propagate_fallback``, a segment whose refinement lost most of its
        seeded frames (tracking collapse) is re-run through full detection
        — one small host sync per segment, device queue stays busy with the
        following refines.
        """
        import itertools

        cfg = self.config
        k = self._detect_k
        b = cfg.frame_batch
        bk = b // k
        while True:
            cycle = list(itertools.islice(pair_iter, k))
            if not cycle:
                return
            kf = np.zeros((b,) + cycle[0][0].sampled.shape[1:], np.uint8)
            for j, (seg, _dev) in enumerate(cycle):
                kf[j * bk : (j + 1) * bk] = seg.sampled[:: k]
            # Cascade-only seed step: the keyframe rows' embeddings come
            # from each segment's refine (seed passthrough through the
            # shared tail), so computing them here would be discarded work.
            seed_box, seed_hf = seed_step(
                self.params, jax.device_put(kf, self._frames_sharding)
            )
            sv_host = (
                np.asarray(seed_hf) if cfg.propagate_fallback else None
            )
            for j, (seg, dev) in enumerate(cycle):
                sb = seed_box[j * bk : (j + 1) * bk]
                sv = seed_hf[j * bk : (j + 1) * bk]
                out = refine(self.params, dev, sb, sv)
                if cfg.propagate_fallback:
                    hf = np.asarray(out.has_face[: seg.n_valid])
                    seeded = np.repeat(
                        sv_host[j * bk : (j + 1) * bk], k
                    )[: seg.n_valid]
                    n_seeded = int(seeded.sum())
                    lost = int((seeded & ~hf).sum())
                    if n_seeded and lost * 2 > n_seeded:
                        out = step(self.params, dev)
                yield seg, out

    def _propagate_outputs_auto(self, pair_iter, step, yuv: bool):
        """Yield (segment, FrameOutputs) with ADAPTIVE keyframing
        (config.detect_interval = "auto").

        Fixed-K propagate trades a hard <=(K-1)-sample blind spot for
        throughput everywhere, including across scene cuts.  This ladder
        spends that budget only where the content earns it: the interval
        escalates K = 1 -> 2 -> 4 -> ... -> auto_interval_max while
        refinement keeps re-acquiring its seeds (each cycle's survivor
        count over seeded slots — the same quantity propagate_fallback
        tests, one small host sync per segment), and collapses back to
        per-segment full detection the moment a cycle loses too many.
        Every k>1 cycle is EXACTLY the fixed-K macro-cycle (keyframes
        host-gathered across k segments into one full-width batch, lane
        efficiency per PERFORMANCE.md finding 6; per-segment fallback
        unchanged), so decision drift at rung k is the fixed-K drift the
        table already pins — "auto" only chooses WHICH rung runs.
        Telemetry: auto_keyframe_segments / auto_refine_segments /
        auto_interval_current."""
        import itertools

        cfg = self.config
        b = cfg.frame_batch
        kmax = cfg.auto_interval_max
        k = 1
        while True:
            if k == 1:
                nxt = next(pair_iter, None)
                if nxt is None:
                    return
                seg, dev = nxt
                out = step(self.params, dev)
                self.auto_keyframe_segments += 1
                # Escalate once full detection is actually tracking
                # something: a majority of valid rows hold a face.
                hf = np.asarray(out.has_face[: seg.n_valid])
                if seg.n_valid and hf.mean() >= 0.5:
                    k = min(2, kmax)
                self.auto_interval_current = k
                yield seg, out
                continue
            refine = self._ensure_propagate_step(yuv, k=k)
            cycle = list(itertools.islice(pair_iter, k))
            if not cycle:
                return
            bk = b // k
            kf = np.zeros((b,) + cycle[0][0].sampled.shape[1:], np.uint8)
            for j, (seg, _dev) in enumerate(cycle):
                kf[j * bk : (j + 1) * bk] = seg.sampled[:: k]
            # Cascade-only seed step (see _propagate_outputs).
            seed_box, seed_hf = self._ensure_detect_step(yuv)(
                self.params, jax.device_put(kf, self._frames_sharding)
            )
            sv_host = np.asarray(seed_hf)
            cycle_seeded = cycle_lost = 0
            for j, (seg, dev) in enumerate(cycle):
                sb = seed_box[j * bk : (j + 1) * bk]
                sv = seed_hf[j * bk : (j + 1) * bk]
                out = refine(self.params, dev, sb, sv)
                self.auto_refine_segments += 1
                hf = np.asarray(out.has_face[: seg.n_valid])
                seeded = np.repeat(
                    sv_host[j * bk : (j + 1) * bk], k
                )[: seg.n_valid]
                n_seeded = int(seeded.sum())
                lost = int((seeded & ~hf).sum())
                cycle_seeded += n_seeded
                cycle_lost += lost
                if (cfg.propagate_fallback and n_seeded
                        and lost * 2 > n_seeded):
                    out = step(self.params, dev)
                    self.auto_keyframe_segments += 1
                yield seg, out
            # Ladder update from the cycle's survivor statistics.
            if cycle_seeded == 0 or cycle_lost * 2 > cycle_seeded:
                k = 1                              # collapse -> re-acquire
            elif cycle_lost <= cfg.auto_escalate_lost * cycle_seeded:
                k = min(k * 2, kmax)               # stable -> escalate
            self.auto_interval_current = k

    def _segment_outputs(self, pair_iter, step, yuv: bool):
        """(segment, FrameOutputs) stream: plain per-segment full detection,
        the keyframe/refine orchestration when detect_interval > 1, or the
        adaptive ladder when detect_interval == "auto"."""
        if self._auto_interval:
            return self._propagate_outputs_auto(iter(pair_iter), step, yuv)
        if self._detect_k > 1:
            return self._propagate_outputs(
                pair_iter, step, self._ensure_propagate_step(yuv),
                self._ensure_detect_step(yuv),
            )
        return ((seg, step(self.params, dev)) for seg, dev in pair_iter)

    def sharded_step(self, mesh, data_axis: str = "data", yuv: bool = False,
                     multiface: bool = False):
        """Cached (step_fn, params, frames_sharding) for DP execution over
        an explicit mesh — params replicated once per (mesh, axis), the
        step jitted once (re-jitting per caller cost a full retrace and a
        ~100 MB weight re-upload per StreamScheduler construction).
        ``yuv=True`` returns the packed-I420 variant of the step;
        ``multiface=True`` the per-track step (BASELINE config 4)."""
        # Equality, not identity: an equal-but-rebuilt Mesh (same devices,
        # same axes — e.g. two make_mesh calls) must hit the pre-jitted
        # step, not re-trace a bit-identical graph.
        if mesh == self.mesh and data_axis == self._data_axis:
            if multiface:
                if yuv:
                    step = self._ensure_mstep_yuv()
                else:
                    self._ensure_track_jits()
                    step = self._mstep
            else:
                step = self._ensure_yuv_step() if yuv else self._step
            return step, self.params, self._frames_sharding
        key = (mesh, data_axis, yuv, multiface)
        if key not in self._sharded_cache:
            from truely_tpu.parallel.sharding import (
                dp_spec, replicate, shard_frame_step,
            )

            # one replicated params copy per (mesh, axis), shared by the
            # BGR and YUV step variants
            pkey = (mesh, data_axis)
            if pkey not in self._sharded_cache:
                self._sharded_cache[pkey] = replicate(mesh, self.params)
            self._sharded_cache[key] = (
                shard_frame_step(
                    mesh, self.config, data_axis=data_axis, yuv=yuv,
                    multiface=multiface,
                ),
                self._sharded_cache[pkey],
                dp_spec(mesh, data_axis),
            )
        return self._sharded_cache[key]

    def sharded_refine_step(self, mesh, data_axis: str = "data",
                            yuv: bool = False, rows_per_seed: int = 1,
                            multiface: bool = False):
        """Cached (refine_fn, params) for the StreamScheduler's propagate
        mode over an explicit mesh — mirrors ``sharded_step`` (one
        replicated params copy per (mesh, axis), shared with the full
        step; one jit per rows_per_seed).  ``multiface=True`` returns the
        (S, T)-seeded per-track refinement step."""
        if mesh == self.mesh and data_axis == self._data_axis:
            ensure = (self._ensure_stream_mrefine_step if multiface
                      else self._ensure_stream_refine_step)
            return ensure(yuv, rows_per_seed), self.params
        key = (mesh, data_axis, yuv, "refine", rows_per_seed, multiface)
        if key not in self._sharded_cache:
            from truely_tpu.parallel.sharding import (
                replicate, shard_frame_step,
            )

            pkey = (mesh, data_axis)
            if pkey not in self._sharded_cache:
                self._sharded_cache[pkey] = replicate(mesh, self.params)
            self._sharded_cache[key] = (
                shard_frame_step(
                    mesh, self.config, data_axis=data_axis, yuv=yuv,
                    refine_rows=rows_per_seed, multiface=multiface,
                ),
                self._sharded_cache[pkey],
            )
        return self._sharded_cache[key]

    def step_device(self, frames: jax.Array) -> FrameOutputs:
        """One compiled batch step on device-resident frames."""
        return self._step(self.params, frames)

    # ------------------------------------------------------------------

    def analyze_video(
        self,
        input_path: str,
        output_path: Optional[str] = None,
    ) -> VideoAnalysis:
        """Full analysis of a video file; mirrors reference ``run()``
        (server/model.py:11-95) including the annotated output video."""
        cfg = self.config
        t_start = time.perf_counter()
        timings = {"decode": 0.0, "device": 0.0, "temporal": 0.0, "encode": 0.0}

        # Native-YUV ingestion: half the H2D bytes, exact on-device
        # conversion.  With an annotated output the re-encode path needs
        # host pixels too — host_frames produces them via the exact native
        # conversion (byte-identical to cv2's decode, and still ~2.7x
        # faster than cv2's decode+swscale).
        with VideoReader(
            input_path, rgb=not cfg.reference_compat, yuv=cfg.yuv_ingest,
            host_frames=output_path is not None,
        ) as reader:
            meta = reader.meta
            interval = cfg.sample_interval(meta.fps)
            writer = (
                VideoWriter(output_path, meta.fps, meta.width, meta.height)
                if output_path
                else None
            )
            state = init_temporal_state(self.embedding_dim)
            records: List[FrameRecord] = []
            frame_count = 0
            total_processed = 0
            flagged_total = 0

            def fetch_results(out, res):
                # Main thread: ONE host fetch for everything the annotator
                # needs — on remote-TPU rigs each transfer is a full tunnel
                # round trip, so batching fetches dominates host latency.
                t1 = time.perf_counter()
                fetch = (out.crop_bounds, res.has_face, res.annotated,
                         res.flagged, res.similarity, res.counter)
                if cfg.draw_landmarks:
                    fetch = fetch + (out.landmarks68,)
                got = jax.device_get(fetch)
                timings["device"] += time.perf_counter() - t1
                lmks = got[6] if cfg.draw_landmarks else None
                return got[:6] + (lmks,)

            def finish_segment(seg, fetched):
                nonlocal flagged_total, total_processed, frame_count
                bounds, has_face, annotated, flagged, sims, counters, lmks = (
                    fetched
                )
                flagged_total += int(np.sum(flagged[: seg.n_valid]))
                total_processed += seg.n_valid
                frame_count += seg.n_frames

                t2 = time.perf_counter()
                ann = {gi: k for k, gi in enumerate(seg.sampled_indices)}
                for j, gi in enumerate(seg.frame_indices):
                    frame = seg.frames[j] if seg.frames else None
                    k = ann.get(gi)
                    px = None  # interleaved pixels, only if drawn on
                    if k is not None:
                        records.append(
                            FrameRecord(
                                frame_index=gi,
                                has_face=bool(has_face[k]),
                                box=tuple(float(v) for v in bounds[k]),
                                annotated=bool(annotated[k]),
                                flagged=bool(flagged[k]),
                                similarity=float(sims[k]),
                                counter=int(counters[k]),
                            )
                        )
                        draw = annotated[k] and (
                            cfg.draw_mode != "flagged-only" or flagged[k]
                        )
                        if writer and draw:
                            # Only frames that get drawn on need interleaved
                            # pixels; everything else re-encodes straight
                            # from the decoded I420 planes (no colorspace
                            # conversion in either direction).
                            px = (
                                i420_to_bgr_host(
                                    frame, rgb=not cfg.reference_compat
                                )
                                if seg.frames_i420
                                else frame
                            )
                            annotate_frame(
                                px, bounds[k],
                                flagged=bool(flagged[k]), frame_index=gi,
                                rgb=not cfg.reference_compat,
                            )
                            if lmks is not None:
                                from truely_tpu.media.overlay import draw_landmarks

                                x0, y0, x1, y1 = bounds[k]
                                pts = lmks[k] * np.asarray(
                                    [max(x1 - x0, 1), max(y1 - y0, 1)]
                                ) + np.asarray([x0, y0])
                                draw_landmarks(
                                    px, pts, rgb=not cfg.reference_compat
                                )
                    if writer:
                        if px is None and seg.frames_i420:
                            writer.write_i420(frame)
                        else:
                            if px is None:
                                px = frame
                            # cv2 encodes BGR; corrected mode decodes RGB.
                            writer.write(
                                px if cfg.reference_compat
                                else np.ascontiguousarray(px[..., ::-1])
                            )
                timings["encode"] += time.perf_counter() - t2

            yuv_was_active = reader.yuv_active
            step = (
                self._ensure_yuv_step() if reader.yuv_active else self._step
            )
            # With an output video, annotate+encode runs on a worker thread
            # (_AnnotateWorker) so x264 overlaps the tunnel waits.  Score-
            # only runs keep the single-threaded path (the host work is
            # trivial).
            wt = _AnnotateWorker(finish_segment) if writer is not None else None

            def emit(seg, fetched):
                if wt is not None:
                    wt.submit(seg, fetched)
                else:
                    finish_segment(seg, fetched)

            try:
                # One-deep software pipeline: the device (and the H2D upload)
                # works on segment N while the host annotates/encodes N-1.
                in_flight = None
                t0 = time.perf_counter()
                pair_iter = _upload_segments(
                    reader.segments(interval, cfg.frame_batch),
                    sharding=self._frames_sharding,
                )
                for seg, out in self._segment_outputs(
                    pair_iter, step, reader.yuv_active
                ):
                    # Surface encoder failures (disk full, codec error)
                    # promptly: stop decoding/uploading the rest of the
                    # video as soon as the writer thread has failed.
                    if wt is not None and wt.err:
                        break
                    timings["decode"] += time.perf_counter() - t0
                    res = self._temporal(
                        out.embedding, out.has_face, jnp.int32(seg.n_valid), state
                    )
                    state = res.state
                    if in_flight is not None:
                        seg0, out0, res0 = in_flight
                        emit(seg0, fetch_results(out0, res0))
                    in_flight = (seg, out, res)
                    t0 = time.perf_counter()
                if in_flight is not None:
                    seg0, out0, res0 = in_flight
                    emit(seg0, fetch_results(out0, res0))
            finally:
                if wt is not None:
                    wt.shutdown()
                if writer:
                    writer.close()
            if wt is not None and wt.err:
                raise wt.err[0]

        score = int(
            self._score(
                jnp.int32(flagged_total),
                state.counter,
                jnp.int32(total_processed),
                jnp.int32(frame_count),
                jnp.int32(meta.fps),
            )
        )
        timings["total"] = time.perf_counter() - t_start
        return VideoAnalysis(
            fake_score=score,
            frame_count=frame_count,
            fps=meta.fps,
            total_processed=total_processed,
            flagged_count=flagged_total,
            final_counter=int(state.counter),
            records=records,
            timings=timings,
            output_path=output_path,
            yuv_ingest=yuv_was_active,
        )

    # ------------------------------------------------------------------

    def analyze_frames(
        self, frames: np.ndarray, fps: int
    ) -> VideoAnalysis:
        """Analyze an in-memory (N, H, W, 3) uint8 frame array (no file IO).
        Frames are sampled/batched exactly like analyze_video."""
        from types import SimpleNamespace

        cfg = self.config
        interval = cfg.sample_interval(fps)
        n = frames.shape[0]
        sampled_idx = list(range(0, n, interval))
        state = init_temporal_state(self.embedding_dim)
        records: List[FrameRecord] = []
        flagged_total = 0
        b = cfg.frame_batch

        def pairs():
            for s in range(0, len(sampled_idx), b):
                chunk = sampled_idx[s : s + b]
                stack = np.zeros((b, *frames.shape[1:]), np.uint8)
                stack[: len(chunk)] = frames[chunk]
                seg = SimpleNamespace(
                    sampled=stack, n_valid=len(chunk), sampled_indices=chunk
                )
                yield seg, jax.device_put(stack, self._frames_sharding)

        for seg, out in self._segment_outputs(pairs(), self._step, False):
            chunk = seg.sampled_indices
            res = self._temporal(
                out.embedding, out.has_face, jnp.int32(len(chunk)), state
            )
            state = res.state
            bounds, has_face, annotated, flagged, sims, counters = (
                jax.device_get(
                    (out.crop_bounds, res.has_face, res.annotated,
                     res.flagged, res.similarity, res.counter)
                )
            )
            flagged_total += int(np.sum(flagged[: len(chunk)]))
            for k, gi in enumerate(chunk):
                records.append(
                    FrameRecord(
                        frame_index=gi,
                        has_face=bool(has_face[k]),
                        box=tuple(float(v) for v in bounds[k]),
                        annotated=bool(annotated[k]),
                        flagged=bool(flagged[k]),
                        similarity=float(sims[k]),
                        counter=int(counters[k]),
                    )
                )
        score = int(
            self._score(
                jnp.int32(flagged_total),
                state.counter,
                jnp.int32(len(sampled_idx)),
                jnp.int32(n),
                jnp.int32(fps),
            )
        )
        return VideoAnalysis(
            fake_score=score,
            frame_count=n,
            fps=fps,
            total_processed=len(sampled_idx),
            flagged_count=flagged_total,
            final_counter=int(state.counter),
            records=records,
        )

    def _ensure_track_jits(self) -> None:
        from truely_tpu.pipeline.tracks import track_timeline, track_scores

        cfg = self.config
        if not hasattr(self, "_mstep"):
            self._mstep = jax.jit(
                partial(
                    _multiface_step, cfg=cfg, compute_dtype=self._compute_dtype
                ),
                **(
                    {}
                    if self.mesh is None
                    else {"in_shardings": (None, self._frames_sharding)}
                ),
            )
            self._track_fold = jax.jit(
                partial(
                    track_timeline,
                    similarity_threshold=cfg.similarity_threshold,
                    run_length_threshold=cfg.run_length_threshold,
                )
            )
            self._track_scores = jax.jit(
                partial(
                    track_scores,
                    run_length_threshold=cfg.run_length_threshold,
                    long_video_seconds=cfg.long_video_seconds,
                )
            )

    def _ensure_mstep_yuv(self):
        self._ensure_track_jits()
        if not hasattr(self, "_mstep_yuv"):
            self._mstep_yuv = jax.jit(
                partial(
                    _multiface_step_yuv, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                ),
                **(
                    {}
                    if self.mesh is None
                    else {"in_shardings": (None, self._frames_sharding)}
                ),
            )
        return self._mstep_yuv

    def _ensure_mprop_step(self, yuv: bool, k: Optional[int] = None):
        """Lazily-jitted multi-face track-propagated step (compiled only
        when multi_face + detect_interval > 1 paths actually run).  ``k``
        selects an explicit interval (the adaptive "auto" ladder — one
        cached executable per (yuv, rung)); default: the config's fixed
        interval."""
        if not hasattr(self, "_mprop_cache"):
            self._mprop_cache = {}
        key = (yuv, k)
        if key not in self._mprop_cache:
            fn = (_multiface_step_propagate_yuv if yuv
                  else _multiface_step_propagate)
            self._mprop_cache[key] = jax.jit(
                partial(
                    fn, cfg=self.config,
                    compute_dtype=self._compute_dtype,
                    **({} if k is None else {"k": k}),
                ),
                **(
                    {}
                    if self.mesh is None
                    # frames DP-sharded; the (B/K, T) seeds are tiny
                    # and replicated — XLA selects each shard's slice.
                    else {
                        "in_shardings": (
                            None, self._frames_sharding, None, None
                        )
                    }
                ),
            )
        return self._mprop_cache[key]

    def _propagate_m_outputs(self, pair_iter, mstep, refine, mdetect):
        """Yield (segment, (boxes, valid, emb)) chronologically with full
        multi-face detection only on keyframes (detect_interval = K > 1).

        Same macro-cycle orchestration as the single-face
        ``_propagate_outputs`` (keyframes host-gathered across K segments
        into ONE full-width batch for lane efficiency — PERFORMANCE.md
        finding 6), with the T-seed refinement step between keyframes.
        ``propagate_fallback`` counts seeded (row, track) slots the
        refinement lost; a segment that lost most of them (tracking
        collapse, e.g. a scene cut) re-runs full detection."""
        import itertools

        cfg = self.config
        k = cfg.detect_interval
        b = cfg.frame_batch
        bk = b // k
        while True:
            cycle = list(itertools.islice(pair_iter, k))
            if not cycle:
                return
            kf = np.zeros((b,) + cycle[0][0].sampled.shape[1:], np.uint8)
            for j, (seg, _dev) in enumerate(cycle):
                kf[j * bk : (j + 1) * bk] = seg.sampled[:: k]
            # Cascade-only keyframe batch: the refine step re-embeds the
            # keyframe rows bit-identically via the shared tail, so the
            # full step's (B, T, 512) embeddings here were discarded work
            # (advisor r4 finding, closed).
            s_boxes, s_valid = mdetect(
                self.params, jax.device_put(kf, self._frames_sharding)
            )
            sv_host = (
                np.asarray(s_valid) if cfg.propagate_fallback else None
            )
            for j, (seg, dev) in enumerate(cycle):
                sb = s_boxes[j * bk : (j + 1) * bk]
                sv = s_valid[j * bk : (j + 1) * bk]
                out = refine(self.params, dev, sb, sv)
                if cfg.propagate_fallback:
                    ok = np.asarray(out[1][: seg.n_valid])      # (n, T)
                    seeded = np.repeat(
                        sv_host[j * bk : (j + 1) * bk], k, axis=0
                    )[: seg.n_valid]
                    n_seeded = int(seeded.sum())
                    lost = int((seeded & ~ok).sum())
                    if n_seeded and lost * 2 > n_seeded:
                        out = mstep(self.params, dev)
                yield seg, out

    def _propagate_m_outputs_auto(self, pair_iter, mstep, yuv: bool):
        """Yield (segment, (boxes, valid, emb)) with ADAPTIVE keyframing
        (multi-face ``detect_interval="auto"``, round 5).

        The single-face ladder (``_propagate_outputs_auto``) verbatim,
        with (row, track) SLOTS as the survivor currency (the same
        denominator the fixed-K multi-face fallback counts): escalate
        k = 1 -> 2 -> ... -> auto_interval_max while each cycle's T-seed
        refinement keeps re-acquiring its seeded slots, collapse to full
        detection on majority slot loss.  Every k>1 cycle is exactly the
        fixed-K multi-face macro-cycle (cascade-only gathered-keyframe
        seed step + per-segment ``refine_faces_multi``), so rung-k drift
        is the fixed-K drift."""
        import itertools

        cfg = self.config
        b = cfg.frame_batch
        kmax = cfg.auto_interval_max
        k = 1
        while True:
            if k == 1:
                nxt = next(pair_iter, None)
                if nxt is None:
                    return
                seg, dev = nxt
                out = mstep(self.params, dev)
                self.auto_keyframe_segments += 1
                # Escalate once full detection is actually tracking: a
                # majority of valid rows hold at least one live track.
                vv = np.asarray(out[1][: seg.n_valid])      # (n, T)
                if seg.n_valid and vv.any(axis=1).mean() >= 0.5:
                    k = min(2, kmax)
                self.auto_interval_current = k
                yield seg, out
                continue
            refine = self._ensure_mprop_step(yuv, k=k)
            cycle = list(itertools.islice(pair_iter, k))
            if not cycle:
                return
            bk = b // k
            kf = np.zeros((b,) + cycle[0][0].sampled.shape[1:], np.uint8)
            for j, (seg, _dev) in enumerate(cycle):
                kf[j * bk : (j + 1) * bk] = seg.sampled[:: k]
            # Cascade-only seed step (see _propagate_m_outputs).
            s_boxes, s_valid = self._ensure_mdetect_step(yuv)(
                self.params, jax.device_put(kf, self._frames_sharding)
            )
            sv_host = np.asarray(s_valid)
            cycle_seeded = cycle_lost = 0
            for j, (seg, dev) in enumerate(cycle):
                sb = s_boxes[j * bk : (j + 1) * bk]
                sv = s_valid[j * bk : (j + 1) * bk]
                out = refine(self.params, dev, sb, sv)
                self.auto_refine_segments += 1
                ok = np.asarray(out[1][: seg.n_valid])      # (n, T)
                seeded = np.repeat(
                    sv_host[j * bk : (j + 1) * bk], k, axis=0
                )[: seg.n_valid]
                n_seeded = int(seeded.sum())
                lost = int((seeded & ~ok).sum())
                cycle_seeded += n_seeded
                cycle_lost += lost
                if (cfg.propagate_fallback and n_seeded
                        and lost * 2 > n_seeded):
                    out = mstep(self.params, dev)
                    self.auto_keyframe_segments += 1
                yield seg, out
            # Ladder update from the cycle's slot-survivor statistics.
            if cycle_seeded == 0 or cycle_lost * 2 > cycle_seeded:
                k = 1                              # collapse -> re-acquire
            elif cycle_lost <= cfg.auto_escalate_lost * cycle_seeded:
                k = min(k * 2, kmax)               # stable -> escalate
            self.auto_interval_current = k

    def _msegment_outputs(self, pair_iter, mstep, yuv: bool):
        """(segment, (boxes, valid, emb)) stream: plain per-segment full
        multi-face detection, the keyframe/refine orchestration when
        detect_interval > 1, or the adaptive ladder when "auto"."""
        if self._auto_interval:
            return self._propagate_m_outputs_auto(
                iter(pair_iter), mstep, yuv
            )
        if self.config.detect_interval > 1:
            return self._propagate_m_outputs(
                pair_iter, mstep, self._ensure_mprop_step(yuv),
                self._ensure_mdetect_step(yuv),
            )
        return ((seg, mstep(self.params, dev)) for seg, dev in pair_iter)

    def analyze_frames_tracks(self, frames: np.ndarray, fps: int):
        """Multi-face analysis of an in-memory frame array (BASELINE
        config 4): per-track consistency scoring; the aggregate fake score
        is the max over tracks.  Returns (aggregate_score, per_track_scores,
        final TrackState)."""
        from truely_tpu.pipeline.tracks import init_track_state

        cfg = self.config
        self._ensure_track_jits()
        interval = cfg.sample_interval(fps)
        n = frames.shape[0]
        sampled_idx = list(range(0, n, interval))
        state = init_track_state(cfg.max_tracks, self.embedding_dim)
        b = cfg.frame_batch

        def seg_iter():
            for s in range(0, len(sampled_idx), b):
                chunk = sampled_idx[s : s + b]
                stack = np.zeros((b, *frames.shape[1:]), np.uint8)
                stack[: len(chunk)] = frames[chunk]
                yield _MemSegment(sampled=stack, n_valid=len(chunk))

        for seg, (boxes, valid, emb) in self._msegment_outputs(
            _upload_segments(seg_iter(), sharding=self._frames_sharding),
            self._mstep, yuv=False,
        ):
            state, _ = self._track_fold(
                state, boxes, valid, emb, jnp.int32(seg.n_valid)
            )
        per_track = self._track_scores(
            state, jnp.int32(n), jnp.int32(fps)
        )
        per_track = np.asarray(per_track)
        return int(per_track.max(initial=0)), per_track, state

    def analyze_video_multiface(
        self,
        input_path: str,
        output_path: Optional[str] = None,
    ):
        """Multi-face video analysis (BASELINE config 4): every tracked face
        gets its own consistency scoring and red/green annotation; the
        aggregate fake score is the max over tracks.

        Returns (aggregate_score, per_track_scores, final TrackState).
        """
        from truely_tpu.pipeline.tracks import init_track_state

        cfg = self.config
        self._ensure_track_jits()
        with VideoReader(
            input_path, rgb=not cfg.reference_compat, yuv=cfg.yuv_ingest,
            host_frames=output_path is not None,
        ) as reader:
            meta = reader.meta
            interval = cfg.sample_interval(meta.fps)
            writer = (
                VideoWriter(output_path, meta.fps, meta.width, meta.height)
                if output_path
                else None
            )
            state = init_track_state(cfg.max_tracks, self.embedding_dim)
            frame_count = 0
            mstep = (
                self._ensure_mstep_yuv() if reader.yuv_active else self._mstep
            )

            def finish_segment(seg, fetched):
                t_boxes, t_upd, t_flag = fetched

                def _track_drawn(k, t):
                    return bool(t_upd[k, t]) and (
                        cfg.draw_mode != "flagged-only" or bool(t_flag[k, t])
                    )

                ann = {gi: k for k, gi in enumerate(seg.sampled_indices)}
                for gi, frame in zip(seg.frame_indices, seg.frames):
                    k = ann.get(gi)
                    drawn = k is not None and any(
                        _track_drawn(k, t) for t in range(cfg.max_tracks)
                    )
                    if not drawn and seg.frames_i420:
                        # untouched frames re-encode straight from the
                        # decoded I420 planes (no colorspace round trip)
                        writer.write_i420(frame)
                        continue
                    px = (
                        i420_to_bgr_host(frame, rgb=not cfg.reference_compat)
                        if seg.frames_i420
                        else frame
                    )
                    if drawn:
                        for t in range(cfg.max_tracks):
                            if _track_drawn(k, t):
                                annotate_frame(
                                    px, t_boxes[k, t],
                                    flagged=bool(t_flag[k, t]),
                                    frame_index=gi,
                                    rgb=not cfg.reference_compat,
                                )
                    # cv2 encodes BGR; corrected mode decodes RGB.
                    writer.write(
                        px if cfg.reference_compat
                        else np.ascontiguousarray(px[..., ::-1])
                    )

            # Same overlap structure as analyze_video: a one-deep pipeline
            # (device works on segment N while the host fetches N-1) feeding
            # an encode worker thread.
            wt = _AnnotateWorker(finish_segment) if writer is not None else None

            def fetch(outs):
                return jax.device_get(
                    (outs.track_box, outs.track_updated, outs.track_flagged)
                )

            try:
                in_flight = None
                for seg, (boxes, valid, emb) in self._msegment_outputs(
                    _upload_segments(
                        reader.segments(interval, cfg.frame_batch),
                        sharding=self._frames_sharding,
                    ),
                    mstep, yuv=reader.yuv_active,
                ):
                    # Same prompt-failure contract as analyze_video: a dead
                    # writer thread stops the decode/upload loop immediately.
                    if wt is not None and wt.err:
                        break
                    state, outs = self._track_fold(
                        state, boxes, valid, emb, jnp.int32(seg.n_valid)
                    )
                    frame_count += seg.n_frames
                    if wt is None:
                        continue
                    if in_flight is not None:
                        seg0, outs0 = in_flight
                        wt.submit(seg0, fetch(outs0))
                    in_flight = (seg, outs)
                if wt is not None and in_flight is not None:
                    seg0, outs0 = in_flight
                    wt.submit(seg0, fetch(outs0))
            finally:
                if wt is not None:
                    wt.shutdown()
                if writer:
                    writer.close()
            if wt is not None and wt.err:
                raise wt.err[0]
        per_track = np.asarray(
            self._track_scores(state, jnp.int32(frame_count), jnp.int32(meta.fps))
        )
        return int(per_track.max(initial=0)), per_track, state

    def run(self, video_path_one: str, video_path_two: str) -> int:
        """Drop-in equivalent of reference server/model.py ``run()``:
        returns the 0-100 fake score and writes the annotated video.
        With ``config.multi_face`` the score aggregates over face tracks
        (max of per-track scores) instead of first-face-only."""
        import os

        if not os.path.exists(video_path_one) or os.path.getsize(video_path_one) == 0:
            return 0
        try:
            if self.config.multi_face:
                score, _, _ = self.analyze_video_multiface(
                    video_path_one, video_path_two
                )
                return score
            return self.analyze_video(video_path_one, video_path_two).fake_score
        except IOError:
            return 0
