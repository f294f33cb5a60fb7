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

import functools

import jax
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
    plane, then V likewise).  W must be even and H a multiple of 4 (the
    chroma planes only tile into whole packed rows when H/4 is an integer;
    media/decode gates ingestion on the same condition).  Returns (B, H, W, 3)
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


# ---------------------------------------------------------------------------
# Pallas-fused variant
#
# The XLA formulation above is bandwidth-bound on its own intermediates: the
# 2×2 chroma-upsample broadcast-reshapes act as fusion barriers, so XLA
# materializes the int16 luma ramp, the three upsampled chroma terms, and the
# final interleaved stack at (B, H, W) scale (~18 ms/step at 1080p b128).
# The Pallas kernel below does the affine + chroma row-replication + clip in
# one VMEM pass per row strip, writing a channel-planar (B, 3, H, W) output
# whose tiled minor dims are (H, W) — measured 13.0-13.2 ms/step at 1080p
# b128 vs 17.4-17.7 for XLA in the same windows, bit-exact (the trailing
# transpose back to interleaved is fused by XLA and ~free).
#
# Mosaic constraints that shaped it (probe_yuv_pallas, 2026-08-19):
#   - jnp.repeat on the LANE axis does not compile (HTTP 500); on the
#     sublane axis it compiles and is elementwise.  pltpu.repeat is
#     tile-repeat, not elementwise.  => chroma is lane-doubled OUTSIDE the
#     kernel (a cheap u8 XLA pass at half resolution); rows double inside.
#   - int16→uint8 casts do not compile; int32-clip→uint8 does.  All
#     in-kernel arithmetic stays int32 (VMEM-resident, so the int16
#     HBM-narrowing trick the XLA path needs is irrelevant here).
#   - An interleaved (.., H, W, 3) output block puts 3 in the lane dim
#     (500s); a (.., 3, H, W) block keeps channel as an outer dim.

# Luma rows per grid block: % 16 == 0 so the half-height chroma block keeps
# the (8, 128) sublane rule; edge blocks are masked by Pallas (1080 = 16×64
# + 56).  64 measured marginally ahead of 80/96 at 1080p.
_PALLAS_BLOCK_ROWS = 64


def pallas_eligible(shape) -> bool:
    """Shapes the fused kernel accepts: I420 with H % 4 == 0 (both this
    kernel and the XLA path unpack the chroma planes by slicing whole
    packed rows, which needs an integral H/4) and lane-aligned width.
    Everything else falls back to the XLA path (same function)."""
    if len(shape) != 3:
        return False
    _b, h32, w = shape
    return h32 % 3 == 0 and (h32 * 2 // 3) % 4 == 0 and w % 128 == 0 and w > 0


def _i420_kernel(y_ref, u_ref, v_ref, o_ref, *, rgb):
    y = y_ref[0].astype(jnp.int32)
    q = (y * _LUMA[0] + _LUMA[1]) >> 16               # (HT, W)
    uu = u_ref[0].astype(jnp.int32)                   # (HT/2, W) lane-doubled
    vv = v_ref[0].astype(jnp.int32)

    def up(t):  # row-double (elementwise repeat on the sublane axis)
        return jnp.repeat(t, 2, axis=0)

    tb = up((uu * _B_U[0] + _B_U[1]) >> 16)
    tg = up(((uu * _G_U[0] + _G_U[1]) >> 16) + ((vv * _G_V[0] + _G_V[1]) >> 16))
    tr = up((vv * _R_V[0] + _R_V[1]) >> 16)

    def chan(t):
        return jnp.clip(q + t, 0, 255).astype(jnp.uint8)

    first, last = (tr, tb) if rgb else (tb, tr)
    o_ref[0, 0] = chan(first)
    o_ref[0, 1] = chan(tg)
    o_ref[0, 2] = chan(last)


@functools.partial(jax.jit, static_argnames=("rgb", "interpret"))
def i420_to_bgr_pallas(
    packed: jnp.ndarray, *, rgb: bool = False, interpret: bool = False
) -> jnp.ndarray:
    """``i420_to_bgr`` as a fused Pallas row-strip kernel (bit-identical).

    TPU-only in production (``interpret=True`` runs the same kernel through
    the Pallas interpreter for CPU tests).  Callers gate on
    ``pallas_eligible(packed.shape)`` and backend; shapes outside the gate
    must use :func:`i420_to_bgr`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h32, w = packed.shape
    h = h32 * 2 // 3
    ht = min(_PALLAS_BLOCK_ROWS, -(-h // 16) * 16)

    y = packed[:, :h, :]
    u = packed[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v = packed[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
    # Lane-doubling (the axis Mosaic can't repeat on) happens here as a
    # cheap half-resolution u8 XLA op; rows double inside the kernel.
    u2 = jnp.repeat(u, 2, axis=2)
    v2 = jnp.repeat(v, 2, axis=2)

    grid = (b, pl.cdiv(h, ht))
    planar = pl.pallas_call(
        functools.partial(_i420_kernel, rgb=rgb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ht, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht // 2, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht // 2, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, ht, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.uint8),
        interpret=interpret,
    )(y, u2, v2)
    return jnp.transpose(planar, (0, 2, 3, 1))


def i420_convert(packed: jnp.ndarray, *, rgb: bool = False,
                 use_pallas: bool = True) -> jnp.ndarray:
    """Backend-aware dispatch: the fused Pallas kernel on TPU for eligible
    shapes, the XLA formulation otherwise.  Both are bit-identical, so the
    choice is purely a performance decision."""
    if (
        use_pallas
        and pallas_eligible(packed.shape)
        and jax.default_backend() == "tpu"
    ):
        return i420_to_bgr_pallas(packed, rgb=rgb)
    return i420_to_bgr(packed, rgb=rgb)
