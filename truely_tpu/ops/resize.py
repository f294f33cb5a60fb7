"""Resize / crop-resize kernels.

Three distinct samplers are needed to reproduce the reference stack's
behaviour on TPU without dynamic shapes:

1. ``resize_area`` — PyTorch ``F.interpolate(mode='area')`` (== adaptive
   average pooling) with *static* output size.  This is what facenet_pytorch's
   ``imresample`` applies to every pyramid level.  Implemented as two
   separable averaging **matmuls** so the whole pyramid runs on the MXU:
   ``out = R_h @ x @ R_w^T`` with exact integer bin edges
   ``[floor(i*H/OH), ceil((i+1)*H/OH))``.

2. ``crop_resize_area`` — the same semantics over *dynamic* per-box crops
   (the R-Net/O-Net stage inputs).  Dynamic bin widths rule out static
   matrices, so it uses an exact int32 **integral image**: the sum over any
   integer-aligned bin is four gathers, and uint8 sums at 1080p stay well
   inside int32.

3. ``crop_resize_bilinear`` — cv2.INTER_LINEAR semantics (half-pixel centers,
   clamp-to-edge, no antialiasing) over dynamic crops, for the 80x80 face
   crop of reference server/model.py:57.

All are pure jnp (gathers + matmuls) so XLA fuses them with the surrounding
normalization; a Pallas variant is only warranted if profiling shows the
gathers dominating.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Static-size area resize (pyramid levels)
# ---------------------------------------------------------------------------


def _area_matrix(in_size: int, out_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(out_size, in_size) row-averaging matrix with adaptive-pool bin edges."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, s:e] = 1.0 / (e - s)
    return jnp.asarray(mat, dtype=dtype)


def resize_area(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    precision=jax.lax.Precision.HIGHEST,
    dtype=None,
) -> jnp.ndarray:
    """Exact 'area'-mode resize of (..., H, W, C) to (..., OH, OW, C).

    Matches torch.nn.functional.interpolate(mode='area') /
    adaptive_avg_pool2d bit-for-bit up to f32 summation order.  Precision is
    pinned to HIGHEST because the TPU MXU default (bf16 inputs) would cost
    ~0.4% error on raw pixel values; pass a lower precision explicitly when
    the consumer tolerates it.

    ``dtype`` sets the compute/intermediate dtype (default float32).  The
    bf16 production cascade passes bf16: uint8 pixels are exact in bf16 and
    halving the intermediate traffic matters (the 12-level 1080p pyramid
    moves multiple GB per batch); parity paths keep float32.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    dtype = dtype or jnp.float32
    if (oh, ow) == (h, w):
        return x.astype(dtype)
    rh = _area_matrix(h, oh, dtype=dtype)  # (OH, H)
    rw = _area_matrix(w, ow, dtype=dtype)  # (OW, W)
    xf = x.astype(dtype)
    # (..., H, W, C) -> (..., OH, W, C): contract H.
    y = jnp.einsum("oh,...hwc->...owc", rh, xf, precision=precision)
    # (..., OH, W, C) -> (..., OH, OW, C): contract W.
    return jnp.einsum("pw,...owc->...opc", rw, y, precision=precision)


def _sum_matrix(in_size: int, out_size: int, dtype) -> Tuple[jnp.ndarray, np.ndarray]:
    """0/1 bin-membership matrix (out_size, in_size) + f32 bin widths."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    widths = np.zeros((out_size,), dtype=np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, s:e] = 1.0
        widths[i] = e - s
    return jnp.asarray(mat, dtype=dtype), widths


def resize_area_u8(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Area resize of uint8 frames on the int8 MXU path (2x bf16 peak).

    Same bin semantics as :func:`resize_area`, but every bin sum is an
    EXACT integer: pixels are shifted by -128 into int8, the H-pass
    contracts with a 0/1 int8 indicator into int32, the W-pass splits the
    (|y| <= 128*bin_h) int32 rows into hi/lo int8 halves (y = hi*128 + lo)
    and contracts each on the int8 MXU, and the shift is undone on the
    exact integer sum before ONE final division by the bin area.  The only
    rounding anywhere is that division and the cast of the result to
    bfloat16 -- strictly tighter than the bf16 two-pass averaging (which
    rounds every intermediate).  Requires bin heights <= 127 (any pyramid
    schedule; asserts otherwise).

    x: (B, H, W, C) uint8.  Returns (B, OH, OW, C) bfloat16.
    """
    assert x.dtype == jnp.uint8, x.dtype
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    sh, wh = _sum_matrix(h, oh, jnp.int8)    # (OH, H), bin heights
    sw, ww = _sum_matrix(w, ow, jnp.int8)    # (OW, W), bin widths
    assert wh.max() <= 127 and ww.max() <= 127, "bin span exceeds int8 split"
    x8 = (x.astype(jnp.int32) - 128).astype(jnp.int8)
    # H-pass: exact int32 row sums, |y| <= 128 * max bin height.
    y = jnp.einsum(
        "oh,...hwc->...owc", sh, x8, preferred_element_type=jnp.int32
    )
    # W-pass: split y into int8 halves so both contractions ride the int8
    # MXU and the recombined sum stays exact.
    hi = (y >> 7).astype(jnp.int8)
    lo = (y - ((y >> 7) << 7)).astype(jnp.int8)   # in [0, 127]
    zhi = jnp.einsum(
        "pw,...owc->...opc", sw, hi, preferred_element_type=jnp.int32
    )
    zlo = jnp.einsum(
        "pw,...owc->...opc", sw, lo, preferred_element_type=jnp.int32
    )
    z = (zhi << 7) + zlo                          # exact sum of (x - 128)
    area = jnp.asarray(wh[:, None] * ww[None, :], jnp.float32)  # (OH, OW)
    mean = (z.astype(jnp.float32) + 128.0 * area[..., None]) / area[..., None]
    return mean.astype(jnp.bfloat16)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-style resize of (..., H, W, C) with static sizes,
    as two separable interpolation matmuls (MXU-friendly)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw

    def lerp_matrix(in_size: int, out_size: int) -> jnp.ndarray:
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        scale = in_size / out_size
        for i in range(out_size):
            src = (i + 0.5) * scale - 0.5
            src = min(max(src, 0.0), in_size - 1.0)
            lo = int(np.floor(src))
            hi = min(lo + 1, in_size - 1)
            f = src - lo
            mat[i, lo] += 1.0 - f
            mat[i, hi] += f
        return jnp.asarray(mat)

    rh = lerp_matrix(h, oh)
    rw = lerp_matrix(w, ow)
    xf = x.astype(jnp.float32)
    p = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hwc->...owc", rh, xf, precision=p)
    return jnp.einsum("pw,...owc->...opc", rw, y, precision=p)


# ---------------------------------------------------------------------------
# Integral image + dynamic-crop area resize (cascade stage crops)
# ---------------------------------------------------------------------------


def integral_image(frames: jnp.ndarray) -> jnp.ndarray:
    """Exact int32 integral image of (B, H, W, C) uint8 frames.

    Returns (B, H+1, W+1, C) with I[b, i, j] = sum over frames[b, :i, :j].
    255 * W * H per channel must stay inside int32 (exact up to ~8.4 MP,
    i.e. beyond 4K); guarded at trace time since frame shapes are static.
    """
    h, w = frames.shape[1], frames.shape[2]
    if 255 * h * w >= 2**31:
        raise ValueError(
            f"integral_image: {h}x{w} frames can overflow int32 "
            f"(255*H*W = {255 * h * w} >= 2^31); split the frame or use a "
            "wider accumulator"
        )
    s = jnp.cumsum(jnp.cumsum(frames.astype(jnp.int32), axis=1), axis=2)
    return jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))


def _bin_edges(start, length, out_size: int):
    """Adaptive-pool bin edges for a dynamic-length segment.

    start, length: () int32 arrays.  Returns (s, e) each (out_size,) int32,
    absolute coordinates; for empty segments (length <= 0) returns s == e.
    """
    i = jnp.arange(out_size, dtype=jnp.int32)
    length = jnp.maximum(length, 0)
    s = start + (i * length) // out_size
    e = start + -((-(i + 1) * length) // out_size)
    return s, jnp.maximum(e, s)


def _crop_area_one(integral: jnp.ndarray, bounds: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Area-resize one dynamic crop from one frame's integral image.

    integral: (H+1, W+1, C) int32; bounds: (4,) int32 half-open
    (x0, y0, x1, y1).  Returns (out_size, out_size, C) float32; zeros if the
    crop is empty.
    """
    x0, y0, x1, y1 = bounds[0], bounds[1], bounds[2], bounds[3]
    sy, ey = _bin_edges(y0, y1 - y0, out_size)
    sx, ex = _bin_edges(x0, x1 - x0, out_size)
    # Gather the four corner planes: (out, W+1, C) row gathers then column.
    top = integral[sy]      # (O, W+1, C)
    bot = integral[ey]      # (O, W+1, C)
    # (O, O, C) via column gathers on each.
    a = top[:, sx]          # I[sy, sx]
    b = top[:, ex]          # I[sy, ex]
    c = bot[:, sx]          # I[ey, sx]
    d = bot[:, ex]          # I[ey, ex]
    area = ((ey - sy)[:, None] * (ex - sx)[None, :]).astype(jnp.float32)
    total = (d - b - c + a).astype(jnp.float32)
    valid = area > 0
    return jnp.where(valid[..., None], total / jnp.maximum(area, 1.0)[..., None], 0.0)


def crop_resize_area(
    integral: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """Batched exact area crop-resize.

    integral: (B, H+1, W+1, C) int32 from :func:`integral_image`.
    bounds:   (B, K, 4) int32 half-open pixel bounds (x0, y0, x1, y1).
    Returns (B, K, out_size, out_size, C) float32 in [0, 255].
    """
    fn = jax.vmap(  # over boxes
        lambda integ, bs: jax.vmap(lambda b: _crop_area_one(integ, b, out_size))(bs),
        in_axes=(0, 0),
    )
    return fn(integral, bounds)


def _bin_indicator(start, stop, size: int, out_size: int, dtype,
                   bins_first: bool = False):
    """0/1 indicator of adaptive-pool bin membership.

    start/stop: (..., out_size) int32 absolute bin edges (half-open).
    Column x belongs to bin j iff start_j <= x < stop_j.
    Returns (..., size, out_size), or (..., out_size, size) when
    ``bins_first`` (generated directly in that orientation — no transpose).
    """
    x = jnp.arange(size, dtype=jnp.int32)  # (size,)
    if bins_first:
        xs = x.reshape((1,) * start.ndim + (size,))
        lo = start[..., :, None]  # (..., out_size, 1)
        hi = stop[..., :, None]
    else:
        xs = x.reshape((1,) * (start.ndim - 1) + (size, 1))
        lo = start[..., None, :]  # (..., 1, out_size)
        hi = stop[..., None, :]
    return jnp.logical_and(xs >= lo, xs < hi).astype(dtype)


def crop_resize_area_mxu(
    frames: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
    *,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Exact area crop-resize as two bin-indicator matmuls on the MXU.

    Replaces the integral-image + gather formulation on TPU: gathers run
    ~45 GB/s there while this is pure batched matmul.  Bit-exact with
    :func:`crop_resize_area`: for uint8 frames the W-contraction runs
    shifted pixels (x - 128, an exact bf16 integer; the shift is undone
    after the area division, exactly, since area-resize of a constant is
    that constant) against the 0/1 indicator on the bf16 MXU with exact
    f32 integer accumulation; the H-contraction accumulates in f32 where
    the largest bin sum (128 * ceil(H/O) * ceil(W/O) at 1080p/24 = ~460k)
    stays below 2^24, so every bin sum is an exact integer before the
    final division.
    Non-uint8 frames fall back to the bf16 formulation (also exact for
    pixel-valued inputs: uint8 pixels are exact in bf16).

    frames: (B, H, W, C) uint8.  bounds: (B, K, 4) int32 half-open pixel
    bounds (x0, y0, x1, y1), already clipped to the frame.
    Returns (B, K, out_size, out_size, C) float32 in [0, 255].
    """
    if frames.ndim == 4 and frames.shape[-1] <= 4:  # NHWC convenience entry
        frames = jnp.transpose(frames, (0, 3, 1, 2))
    b, c, h, w = frames.shape
    k = bounds.shape[1]
    o = out_size
    exact_u8 = frames.dtype == jnp.uint8
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sy, ey = _bin_edges(y0[..., None], (y1 - y0)[..., None], o)
    sx, ex = _bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    # Indicators generated bins-first so H/W stay the minor (lane) dims:
    # a C- or O-minor intermediate would be lane-padded to 128 (up to 42x).
    ybin = _bin_indicator(sy, ey, h, o, jnp.float32, bins_first=True)
    if exact_u8:
        # bf16 MXU with f32 accumulation — still EXACT: uint8 pixels
        # shifted by -128 are integers |v| <= 128 (exact in bf16), the
        # 0/1 indicator is exact, every product is exact, and the f32
        # accumulation of integer column sums (|sum| <= 128 * bin_w <
        # 2^24) is exact.  Beats the earlier int8->int32 formulation by
        # ~25% at 1080p b128 (34.5 vs 46 ms, scripts/probes/
        # probe_crops2.py): emitting f32 directly removes the int32
        # intermediate's write+read+convert round trip, which outweighs
        # the halved MXU rate.  Verified bit-exact on chip.
        xbin = _bin_indicator(sx, ex, w, o, jnp.bfloat16, bins_first=True)
        pix = (frames.astype(jnp.int32) - 128).astype(jnp.bfloat16)
        # 4-D LHS: the dot emits (B, K, O, C, H) directly.  Flattening the
        # LHS to (B, K*O, W) and reshaping the output costs a full layout
        # copy of the ~2.5 GB intermediate in the compiled HLO (measured
        # 44 -> 30 ms at 1080p b128 K=64, scripts/probes/probe_fused2.py).
        cols = jax.lax.dot_general(
            xbin,
            pix,
            dimension_numbers=(((3,), (3,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    else:
        xbin = _bin_indicator(sx, ex, w, o, dtype, bins_first=True)
        # Contract W: (B, K, O, W) x (B, C, H, W) -> (B, K, O, C, H).
        cols = jax.lax.dot_general(
            xbin,
            frames.astype(dtype),
            dimension_numbers=(((3,), (3,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    # Contract H per (B, K): (B, K, O, C, H) x (B, K, O, H) -> (B, K, O, C, O).
    # Column sums exceed bf16's exact-integer range (~2^8), so this (much
    # smaller) contraction runs in f32 at HIGHEST precision: the 3-way bf16
    # split represents the f32 inputs exactly and the accumulation stays
    # below 2^24, keeping bin sums exact integers.
    sums = jax.lax.dot_general(
        cols,
        ybin,
        dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, K, O_x, C, O_y)
    sums = sums.transpose(0, 1, 4, 2, 3)  # (B, K, O_y, O_x, C)
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(
        jnp.float32
    )  # (B, K, O, O)
    if exact_u8:
        # Undo the pixel shift BEFORE the division: sums and 128*area are
        # both exact f32 integers (< 2^24), so their sum is the exact
        # unshifted bin sum and the division rounds identically to the
        # integral-image formulation (bit-exact).
        sums = sums + 128.0 * area[..., None]
    mean = sums / jnp.maximum(area, 1.0)[..., None]
    return jnp.where(area[..., None] > 0, mean, 0.0)


def block_sum_frames(frames: jnp.ndarray, quant: int) -> jnp.ndarray:
    """Exact ``quant x quant`` block sums of a (B, C, H, W) uint8 frame batch
    as two indicator matmuls: (B, C, H/q, W/q) float32 integer sums.

    W-pass: bf16 0/1 x u8 pixels with f32 accumulation (row sums
    <= 255*q, exact).  H-pass: f32 HIGHEST on those sums (block sums
    <= 255*q^2 < 2^24, exact).
    """
    b, c, h, w = frames.shape
    wmat, _ = _sum_matrix(w, w // quant, jnp.bfloat16)
    hmat, _ = _sum_matrix(h, h // quant, jnp.float32)
    cols = jax.lax.dot_general(  # (B,C,H,W) x (W/q,W) -> (B,C,H,W/q)
        frames.astype(jnp.bfloat16), wmat,
        dimension_numbers=(((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(  # contract H -> (B,C,W/q,H/q), then swap
        cols, hmat, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 1, 3, 2)


def crop_resize_area_mxu_quant(
    frames: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
    *,
    quant: int = 4,
) -> jnp.ndarray:
    """Stage crops with box coords snapped to a ``quant``-px grid: exact
    adaptive-pool crop semantics on the quant-downsampled frame.

    The production fidelity/speed trade for the step's #1+#2 device ops —
    the full-resolution W-contractions of :func:`crop_resize_area_mxu`
    (~16 ms EACH at 1080p b128, ~78% of bf16 MXU peak, i.e. FLOP-bound):
    contracting the q x q block-mean frame divides the dot FLOPs by q^2
    (measured 40.9 -> 21.4 ms for both stages at q=4, 14.5 ms at q=8 —
    scripts/probes/probe_crops4.py).  Same trade class as the cascaded
    pyramid (PERFORMANCE.md finding 11): box edges move <= q-1 px and each
    bin averages q x q superpixels; parity paths keep the exact
    :func:`crop_resize_area_mxu`.

    Everything stays EXACT INTEGER arithmetic under the quantized
    semantics: block sums via :func:`block_sum_frames`, crop contractions
    in f32 HIGHEST on 0/1 indicators (every bin sum an exact integer
    < 2^24), one final division by ``bin_area * quant^2``.  Verified
    against an independent numpy restatement (tests/test_resize.py).

    frames: (B, C, H, W) or (B, H, W, C) uint8 with H, W divisible by
    ``quant``.  bounds: (B, K, 4) int32 half-open, clipped.  Returns
    (B, K, out_size, out_size, C) float32 in [0, 255]; empty boxes stay
    empty (zeros) under quantization.
    """
    if frames.ndim == 4 and frames.shape[-1] <= 4:
        frames = jnp.transpose(frames, (0, 3, 1, 2))
    b, c, h, w = frames.shape
    if h % quant or w % quant:
        return crop_resize_area_mxu(frames, bounds, out_size)
    o = out_size
    bs = block_sum_frames(frames, quant)  # (B, C, H/q, W/q) f32 sums
    hq, wq = h // quant, w // quant
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    qx0, qy0 = x0 // quant, y0 // quant
    # ceil for the far edge so boxes never quantize to empty; boxes that
    # ARE empty (x1 <= x0) must stay empty.
    qx1 = jnp.where(x1 > x0, -(-x1 // quant), qx0)
    qy1 = jnp.where(y1 > y0, -(-y1 // quant), qy0)
    sy, ey = _bin_edges(qy0[..., None], (qy1 - qy0)[..., None], o)
    sx, ex = _bin_edges(qx0[..., None], (qx1 - qx0)[..., None], o)
    ybin = _bin_indicator(sy, ey, hq, o, jnp.float32, bins_first=True)
    xbin = _bin_indicator(sx, ex, wq, o, jnp.float32, bins_first=True)
    cols = jax.lax.dot_general(  # (B,K,O,Wq) x (B,C,Hq,Wq) -> (B,K,O,C,Hq)
        xbin, bs, dimension_numbers=(((3,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sums = jax.lax.dot_general(
        cols, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 1, 4, 2, 3)  # (B, K, O_y, O_x, C)
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(
        jnp.float32
    )
    mean = sums / (jnp.maximum(area, 1.0)[..., None] * float(quant * quant))
    return jnp.where(area[..., None] > 0, mean, 0.0)


# ---------------------------------------------------------------------------
# Dynamic-crop bilinear resize (face crops, cv2.INTER_LINEAR semantics)
# ---------------------------------------------------------------------------


def _crop_bilinear_one(frame: jnp.ndarray, bounds: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear-resize one dynamic crop (cv2.resize INTER_LINEAR semantics).

    frame: (H, W, C); bounds: (4,) int32 half-open (x0, y0, x1, y1).
    Returns (out_size, out_size, C) float32; zeros for empty crops.
    """
    h, w = frame.shape[0], frame.shape[1]
    x0, y0, x1, y1 = bounds[0], bounds[1], bounds[2], bounds[3]
    ch = (y1 - y0).astype(jnp.float32)
    cw = (x1 - x0).astype(jnp.float32)
    i = jnp.arange(out_size, dtype=jnp.float32)
    # Half-pixel mapping inside the crop, clamped to the crop (cv2 clamps
    # sample coords to the source image; crop bounds are already in-image).
    sy = jnp.clip((i + 0.5) * ch / out_size - 0.5, 0.0, jnp.maximum(ch - 1.0, 0.0))
    sx = jnp.clip((i + 0.5) * cw / out_size - 0.5, 0.0, jnp.maximum(cw - 1.0, 0.0))
    ay = y0.astype(jnp.float32) + sy
    ax = x0.astype(jnp.float32) + sx
    y_lo = jnp.floor(ay).astype(jnp.int32)
    x_lo = jnp.floor(ax).astype(jnp.int32)
    fy = (ay - y_lo)[:, None, None]
    fx = (ax - x_lo)[None, :, None]
    y_hi = jnp.clip(y_lo + 1, 0, h - 1)
    x_hi = jnp.clip(x_lo + 1, 0, w - 1)
    y_lo = jnp.clip(y_lo, 0, h - 1)
    x_lo = jnp.clip(x_lo, 0, w - 1)

    # Gather rows and corner columns in the SOURCE dtype, converting only
    # the (O, O, C) corner samples to f32: converting the full (O, W, C)
    # row blocks first materialized two ~236 MB f32 intermediates with
    # layout copies (1.3 ms each at 1080p b128 — step trace, copy.1848/55).
    # u8 -> f32 conversion commutes with gathering, so this is bit-exact.
    rows_lo = frame[y_lo]  # (O, W, C)
    rows_hi = frame[y_hi]
    tl = rows_lo[:, x_lo].astype(jnp.float32)
    tr = rows_lo[:, x_hi].astype(jnp.float32)
    bl = rows_hi[:, x_lo].astype(jnp.float32)
    br = rows_hi[:, x_hi].astype(jnp.float32)
    top = tl + (tr - tl) * fx
    bot = bl + (br - bl) * fx
    out = top + (bot - top) * fy
    nonempty = jnp.logical_and(y1 > y0, x1 > x0)
    return jnp.where(nonempty, out, 0.0)


def crop_resize_bilinear(
    frames: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """Batched bilinear crop-resize.

    frames: (B, H, W, C); bounds: (B, K, 4) int32 half-open (x0, y0, x1, y1).
    Returns (B, K, out_size, out_size, C) float32.
    """
    fn = jax.vmap(
        lambda fr, bs: jax.vmap(lambda b: _crop_bilinear_one(fr, b, out_size))(bs),
        in_axes=(0, 0),
    )
    return fn(frames, bounds)
