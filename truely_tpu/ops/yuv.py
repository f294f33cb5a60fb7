"""Exact on-device yuv420p → BGR/RGB conversion (the cv2/swscale function).

The reference decodes with cv2.VideoCapture (server/model.py:23,42-45),
whose FFmpeg wrapper converts every frame to packed BGR on the host via
swscale before Python sees it.  H.264/H.265/VP9 content is 4:2:0, so for
the TPU pipeline that host conversion is pure waste: uploading the
decoder's native YUV420 planes moves 1.5 bytes/px instead of 3 — half the
host→device bytes on the dominant transfer — and the colorspace conversion
becomes the first (fused, VPU-elementwise) step of the bucket jit.

Bit-exactness: decisions must not drift vs the reference decode path, so
this implements *exactly* the function cv2's bundled swscale applies for
untagged/BT.601 limited-range yuv420p → bgr24.  That function was learned
empirically — every one of the 16.7M (y, u, v) triples was pushed through
cv2's own decoder via synthesized raw-I420 AVI files — and it reduces to
integer fixed-point affine forms with 2×2 chroma replication:

    q = (76305·y − 1219995) >> 16                  (shared luma ramp)
    B = clip(q + ((132193·u − 16920704) >> 16))
    G = clip(q + ((−25673·u + 3286144) >> 16) + ((−53281·v + 6819968) >> 16))
    R = clip(q + ((104593·v − 13387904) >> 16))

(arithmetic shift = floor division by 2^16).  The fit is exact on all
16,777,216 inputs and on every frame of the bundled H.264 fixture
(tests/test_yuv.py re-verifies against cv2 end to end).  Streams that are
not eligible for this table set (non-yuv420p pixel formats, full-range, or
non-BT.601 colorspace tags) fall back to the cv2 decode path in
media/decode.py, so this op is only ever applied where it is provably
exact.
"""

from __future__ import annotations

import jax.numpy as jnp

# Fixed-point (m, b) with out = (m*x + b) >> 16, learned exactly from cv2.
_LUMA = (76305, -1219995)
_B_U = (132193, -16920704)
_G_U = (-25673, 3286144)
_G_V = (-53281, 6819968)
_R_V = (104593, -13387904)


def _affine(x, mb):
    m, b = mb
    return (x * m + b) >> 16


def i420_to_bgr(packed: jnp.ndarray, *, rgb: bool = False) -> jnp.ndarray:
    """Convert standard I420 pictures to interleaved BGR (or RGB) uint8.

    ``packed``: (B, H*3//2, W) uint8 — the I420 memory layout cv2 itself
    uses (Y as H rows of W, then U as H/4 rows of W holding the H/2×W/2
    plane, then V likewise).  H and W must be even.  Returns (B, H, W, 3)
    uint8, byte-identical to cv2's BGR decode of the same stream (``rgb=True``
    reverses channel order, matching corrected-mode's host-side flip).
    """
    b, h32, w = packed.shape
    h = h32 * 2 // 3
    ch, cw = h // 2, w // 2
    y = packed[:, :h, :].astype(jnp.int32)
    # each packed row past Y holds two chroma rows of W/2: a plain reshape
    # reproduces the plane exactly (contiguity matches the I420 layout).
    u = packed[:, h : h + h // 4, :].reshape(b, ch, cw).astype(jnp.int32)
    v = packed[:, h + h // 4 :, :].reshape(b, ch, cw).astype(jnp.int32)

    # Every post-shift value fits int16 (q ∈ [-19, 278], chroma terms ∈
    # [-259, 256], sums ∈ [-483, 534]), so the luma ramp and the chroma
    # TERMS narrow to int16 before any full-resolution materialization —
    # XLA materializes the 2×2 chroma upsample and the per-channel planes
    # at (B, H, W) scale, and int16 halves every one of those buffers
    # (measured: the naive s32 version cost ~42 ms/step at 1080p b128,
    # dominated by four ~1 GB s32 broadcast materializations + layout
    # copies — scripts/probes/probe_yuv_trace.py).
    q = _affine(y, _LUMA).astype(jnp.int16)
    tb = _affine(u, _B_U).astype(jnp.int16)
    tg = (_affine(u, _G_U) + _affine(v, _G_V)).astype(jnp.int16)
    tr = _affine(v, _R_V).astype(jnp.int16)

    # 2×2 chroma replication (swscale's unscaled fast path does not
    # interpolate), as a broadcast-reshape so XLA fuses it.
    def up2(p):
        return jnp.broadcast_to(
            p[:, :, None, :, None], (b, ch, 2, cw, 2)
        ).reshape(b, h, w)

    def chan(term):
        return jnp.clip(q + up2(term), 0, 255).astype(jnp.uint8)

    bb, gg, rr = chan(tb), chan(tg), chan(tr)
    chans = (rr, gg, bb) if rgb else (bb, gg, rr)
    return jnp.stack(chans, axis=-1)
