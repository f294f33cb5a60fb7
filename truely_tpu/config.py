"""Typed configuration for the whole framework.

The reference hardcodes every knob (thresholds 0.99/15 at server/model.py:16-17,
~7 Hz sampling at :40, 80x80 crops at :41, port 5001 at server/server.py:976,
360p quality cap at :251, TTLs at :88/:105).  Here they are lifted into frozen
dataclasses so they are explicit, testable, and usable as static jit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MTCNNConfig:
    """Cascade parameters (facenet_pytorch MTCNN defaults, which the reference
    uses via the bare ``MTCNN()`` ctor at server/model.py:18)."""

    min_face_size: int = 20
    # Stage score thresholds for P-Net / R-Net / O-Net.
    thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7)
    # Pyramid decimation factor between scales.
    scale_factor: float = 0.709
    # NMS IoU thresholds: per-scale P-Net, cross-scale P-Net, R-Net, O-Net.
    nms_thresholds: Tuple[float, float, float, float] = (0.5, 0.7, 0.7, 0.7)
    # Round cap for the parallel-greedy NMS fixpoint: 0 = run to
    # convergence (exact greedy, any chain depth); >0 bounds worst-case
    # latency — real suppression chains are a handful of rounds deep, so 64
    # is semantically safe while keeping adversarial inputs O(rounds).
    nms_max_rounds: int = 64
    # Run ungrouped NMS calls through the Pallas VMEM-resident kernel
    # (ops/nms_pallas.py) instead of the XLA fixpoint.  Identical results
    # (tested bit-equal on TPU); the grouped per-scale call always uses XLA.
    use_pallas_nms: bool = False
    # Run the R-Net/O-Net stage crops through a fused Pallas kernel instead
    # of the XLA matmul path: 0/False = off (default), 1/True =
    # ops/crop_area_fused.py (all-pairs second contraction; measured 78 vs
    # 46 ms for K=64 O=24, 101 vs 53 ms for K=32 O=48 at 1080p b128),
    # 2 = ops/crop_fused2.py (single frame pass, column sums VMEM-resident;
    # 62.6 vs 30.4 ms, scripts/probes/probe_fused2.py).  Both bit-exact
    # with the XLA path (tested) but measured slower — the full-resolution
    # crop dots are FLOP-bound at ~78% of bf16 MXU peak, so the XLA path
    # stands.  Kept as opt-in reference implementations.  TPU-only;
    # ignored on CPU.  (bool works: True selects v1.)
    use_fused_crops: int = 0
    # Run the P-Net trunk in the width-folded layout (ops/fold.py): F=4
    # adjacent pixels fold into channels so the 3/10/16/32-channel convs
    # become 12->40/40->64/64->128-channel convs that reach real MXU
    # utilization, at a 2.67x FLOP inflation that nets out ~3x faster on
    # TPU.  Production (precision=None) paths only — parity paths pinned
    # to f32/HIGHEST keep the direct trunk, whose contraction order the
    # torch oracles are bit-matched against.
    use_folded_pnet: bool = True
    # Resample each pyramid level from the PREVIOUS level instead of the
    # full frame (production precision=None paths only).  The direct
    # per-level resample contracts the full 1080p frame twelve times
    # (measured 58 ms at b128 for the exact int8 path, 42 ms bf16); the
    # cascade's geometric work measures 21 ms.  Values drift from the
    # exact one-shot area resample by bf16 rounding compounded per level
    # (bounded in tests/test_resize.py::test_pyramid_cascade_drift);
    # parity paths (precision=HIGHEST) always use the exact resample.
    pyramid_cascade: bool = True
    # Snap R-Net/O-Net crop boxes to an N-px grid so the stage-crop dots
    # contract the N x N block-mean frame instead of the full frame
    # (production bf16 paths only; same gate as pyramid_cascade).  The
    # full-resolution W-contractions are the step's top-2 device ops and
    # FLOP-bound at ~78% of bf16 MXU peak, so the q^2 FLOP cut is the only
    # lever left: measured 40.9 -> 21.4 ms (q=4) / 14.5 ms (q=8) for both
    # stages at 1080p b128 (scripts/probes/probe_crops4.py).  Box edges
    # move <= N-1 px and each output bin averages N x N superpixels;
    # arithmetic stays exact integers under the quantized semantics.
    # 1 disables (exact full-res crops — all parity/golden paths).
    # Measured decision impact (with bf16, vs the f32 exact chain, random
    # weights): PERFORMANCE.md "Fast-path drift".
    stage_crop_quant: int = 4
    # Fixed capacities (TPU-native replacement for dynamic box counts):
    # ONE global top-K over every cell of every pyramid level (fan-in
    # stage-1 design, see pipeline/mtcnn._stage1), then after R-Net and
    # after O-Net.
    pnet_topk_total: int = 256
    rnet_capacity: int = 64
    onet_capacity: int = 32
    # Select the largest-area box first (facenet_pytorch select_largest=True,
    # which is what makes reference model.py:49 ``boxes[0]`` the largest face).
    select_largest: bool = True

    @property
    def num_stages(self) -> int:
        return 3


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """End-to-end visual detector parameters (reference server/model.py)."""

    mtcnn: MTCNNConfig = MTCNNConfig()
    # Cosine-similarity threshold below which a frame-pair is "drifting"
    # (reference model.py:16).
    similarity_threshold: float = 0.99
    # Consecutive drifting sampled-frames before flagging (model.py:17).
    run_length_threshold: int = 15
    # Face-crop side fed to FaceNet.  The reference uses 80 (model.py:41),
    # NOT FaceNet's canonical 160 — reproduced under reference_compat.
    crop_size: int = 80
    # Frames-per-second of *analysis*; sampling interval is
    # ``max(1, int(fps / sample_hz))`` (model.py:40).
    sample_hz: int = 7
    # Device batch size for sampled frames.
    frame_batch: int = 32
    # Reproduce reference quirks exactly: BGR input to MTCNN, /255 crop
    # scaling without fixed standardization, largest-face-only selection.
    reference_compat: bool = True
    # Compute dtype for conv stacks (params stay fp32; MXU runs bf16).
    compute_dtype: str = "bfloat16"
    # Long-video weighting kicks in above this many seconds (model.py:91).
    long_video_seconds: int = 30
    # Run per-face tracks instead of first-face-only (BASELINE config 4).
    multi_face: bool = False
    max_tracks: int = 4
    # Draw the 68-point landmark head's output on annotated frames
    # (BASELINE config 2).
    draw_landmarks: bool = False
    # Which frames get boxes drawn in the annotated output video:
    # "all" = the reference contract (red/green on EVERY sampled frame
    # with a face, server/model.py:67-74); "flagged-only" = red boxes on
    # flagged frames only, so clean frames skip the i420→BGR→draw→encode
    # conversion path entirely and re-encode straight from the decoded
    # I420 planes (write_i420) — a corrected-mode host-cost lever for the
    # annotated path (PERFORMANCE.md "annotated path"); detection /
    # scoring decisions are identical in both modes.
    draw_mode: str = "all"
    # Use the Pallas face-crop kernel (ops/crop_pallas.py) instead of the
    # XLA gather path.  Same semantics within f32 rounding.  Measured on
    # v5e: ~25% faster standalone on large crops (≥ quarter-frame boxes,
    # e.g. 1080p b8 k4: 2.0 ms vs 2.6 ms), but slower inside the full frame
    # step on typical small face crops (0.88 ms vs 0.60 ms per 32-frame
    # 1080p batch) where XLA's fused gathers win — hence default off.
    # TPU-only; ignored on CPU.
    use_pallas_crop: bool = False
    # Upload sampled frames as native yuv420p (1.5 bytes/px, half the
    # host→device volume of BGR) and run the exact cv2/swscale colorspace
    # conversion on-device as the first fused step of the bucket jit
    # (ops/yuv.py).  When an annotated output video is written, host
    # frames come from the same exact conversion natively (framepack
    # i420_to_bgr — byte-identical to cv2's decode, ~2.7x faster than
    # cv2's decode+swscale).  Engages when the native videodec extension
    # is built and the stream is eligible (8-bit yuv420p, untagged/BT.601
    # limited range) — otherwise the cv2 decode path is used, so results
    # are bit-identical either way.
    yuv_ingest: bool = True
    # Run the on-device i420→BGR conversion as the fused Pallas row-strip
    # kernel (ops/yuv.i420_to_bgr_pallas) instead of the XLA formulation.
    # Bit-identical output; measured 13.0-13.2 vs 17.4-17.7 ms/step at
    # 1080p b128 (probe_yuv_pallas).  TPU-only and shape-gated (falls back
    # to the XLA path on CPU and on widths not lane-aligned to 128).
    yuv_pallas: bool = True

    # Track-propagated detection (production throughput lever, default
    # off): run the full pyramid + P-Net cascade only on every K-th sampled
    # frame ("keyframes"); between keyframes, seed R-Net/O-Net refinement
    # from the most recent keyframe's box (pipeline/mtcnn.refine_faces) —
    # the unchanged stage-2/3 machinery re-scores and can reject the
    # propagated box, and the embedding/temporal semantics are untouched.
    # The reference re-detects from scratch every sampled frame
    # (server/model.py:47); on TPU ~2/3 of the frame step re-discovers a
    # box the previous frame already proved.  1 = off (every sampled frame
    # is a keyframe — bit-identical to full detection, tested).  Semantics
    # at K>1: a face appearing (or moving beyond ~0.5 box-sides) mid-
    # interval is picked up at the next keyframe, <= (K-1) samples late;
    # measured decision impact is in the drift table (PERFORMANCE.md).
    # Keyframes batch across K segments for lane efficiency, so
    # ``frame_batch`` must be divisible by this.  Composes with
    # ``multi_face``: every track's box seeds its own refinement
    # candidates between keyframes (refine_faces_multi).  Parity/golden
    # paths never set it.
    #
    # "auto": ADAPTIVE keyframing — the interval ladders up
    # K = 1 -> 2 -> 4 -> ... -> auto_interval_max while refinement keeps
    # re-acquiring its seeds (the per-frame O-Net re-score and the
    # per-segment survivor count are the confidence signals, both already
    # computed), and drops back to per-segment full detection the moment
    # a cycle loses too many seeded slots (the propagate_fallback
    # collapse test).  Stable content pays K_max-level cost; churny
    # content keeps full-detection fidelity; the blind-spot budget is
    # bounded by auto_interval_max exactly as fixed K bounds it.
    # Composes with multi_face (round 5: the ladder's survivor currency
    # is then seeded (row, track) slots); the StreamScheduler's auto
    # cadence remains single-face — a multi-face scheduler handed "auto"
    # degrades to full detection every step (use a fixed interval for
    # propagated multi-face streaming).
    detect_interval: "int | str" = 1
    # "auto" mode's interval cap (power of two; frame_batch must divide
    # by it).  Also the escalation ladder's top rung.
    auto_interval_max: int = 8
    # "auto" mode: escalate the interval after a cycle whose refinement
    # lost at most this fraction of its seeded slots.
    auto_escalate_lost: float = 0.1
    # With detect_interval > 1: re-run full detection on any segment whose
    # refinement lost more than half of its seeded slots (tracking
    # collapse — fast motion, scene cut).  Single-face counts seeded
    # FRAMES; multi-face counts seeded (row, track) SLOTS — a subtly
    # stricter denominator when frames carry varying track counts (see
    # Detector._propagate_m_outputs).  Costs one host sync per segment
    # (~round-trip latency, negligible on PCIe hosts); disable for maximum
    # throughput where the K-sample re-acquisition latency is acceptable.
    propagate_fallback: bool = True

    def sample_interval(self, fps: int) -> int:
        return max(1, int(fps / self.sample_hz))


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    """API server parameters (reference server/server.py)."""

    host: str = "0.0.0.0"
    port: int = 5001
    result_ttl_seconds: float = 3600.0
    cleanup_period_seconds: float = 300.0
    default_quality: str = "360p"
    video_download_timeout: float = 180.0
    audio_download_timeout: float = 120.0
    probe_timeout: float = 30.0
    # Optional JSON snapshot so unexpired results survive server restarts
    # (the reference loses all results on restart, SURVEY.md §5).
    result_store_path: str = ""
    # Resolution buckets ("HxW") to pre-compile at startup on a background
    # thread, so the first /analyze-* request doesn't pay the cold compile
    # (minutes on remote-compile TPU rigs).  /health reports progress.
    warmup_resolutions: tuple = ()


@dataclasses.dataclass(frozen=True)
class AgentsConfig:
    """Fact-check agent parameters (reference server/web/)."""

    groq_model: str = "whisper-large-v3-turbo"
    gemini_model: str = "gemini-2.5-flash"
    gemini_temperature: float = 0.2
    tavily_max_results: int = 5
    search_query_max_chars: int = 350
    fallback_query_words: int = 30
