"""Fused Pallas TPU kernel for the exact area stage crops (R-Net/O-Net).

Replaces the two-matmul XLA formulation (ops/resize.crop_resize_area_mxu)
whose (B, K, O, C, H) column-sum intermediate round-trips ~2.5 GB of HBM
per stage at 1080p b128 (measured: the stage crops are ~100 ms of a
~200 ms frame step, ~4x their traffic+FLOP floor).  This kernel keeps the
intermediate in VMEM:

- The frame rides in PLANAR, W-major, shifted-int8 form (B, C, W, H):
  ``p - 128`` fits int8, and uint8 pixels are exact in bf16, so every
  matmul below is exact integer arithmetic in bf16xbf16->f32.
- Grid (B, K/KT, W/128), W-tiles innermost.  Each step does one MXU dot
  per channel: ``xbin_tile (KT*O, 128) @ frame_tile (128, H)`` accumulated
  into a VMEM f32 scratch of exact column sums — the HBM intermediate of
  the XLA path never exists.
- On a frame's last W-tile the scratch is split hi/lo (``cols = hi*128 +
  lo``; both halves exact in bf16 — column sums reach ~10k, past bf16's
  exact-integer range, so a single bf16 dot would round) and contracted
  with the 0/1 row indicator ``ybinT (H, KT*O)`` on the MXU.  That
  computes all (k, k') cross-blocks; the caller keeps the diagonal.
- The +-128 un-shift, the area division, and the empty-crop mask happen
  in XLA on the (B, K, O, O, C) result — identical final math to
  crop_resize_area, so the kernel is BIT-EXACT with the integral-image
  formulation (pinned by tests/test_crop_area_fused.py in interpret mode).

Cost at 1080p b128 (K=64 O=24 and K=32 O=48): ~1.2 TMAC of bf16 dot1 per
stage (the same contraction FLOPs as the XLA path) + ~0.5 TMAC of dot2 +
~1.6 GB of streamed HBM traffic — vs ~10 GB round-tripped by XLA.

Reference semantics: these crops feed R-Net/O-Net exactly like
facenet_pytorch's ``imresample`` (area interpolation) of the per-box crop
regions inside ``MTCNN.detect`` (reference server/model.py:47).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from truely_tpu.ops.resize import _bin_edges, _bin_indicator


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def prep_frames_for_fused_crops(frames_chw: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) uint8 -> (B, C, WP, HP) shifted int8, 128-padded.

    Shared by both stage-crop calls of a cascade step: the transpose +
    shift costs one pass over the frames and is paid once.
    """
    b, c, h, w = frames_chw.shape
    assert frames_chw.dtype == jnp.uint8, frames_chw.dtype
    wp = _ceil_to(w, 128)
    hp = _ceil_to(h, 128)
    x = (frames_chw.astype(jnp.int32) - 128).astype(jnp.int8)
    x = jnp.transpose(x, (0, 1, 3, 2))  # (B, C, W, H)
    return jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, hp - h)))


def _crop_kernel(xbin_ref, frame_ref, ybin_ref, out_ref, cols_ref, *,
                 wt_last: int, channels: int):
    """One (frame, crop-tile, W-tile) program."""
    wt = pl.program_id(2)

    @pl.when(wt == 0)
    def _zero():
        cols_ref[:] = jnp.zeros(cols_ref.shape, cols_ref.dtype)

    # Mosaic has no direct int8->bf16 cast on this backend; hop through
    # int32/f32 (values are in [-128, 127]: exact at every stop).
    xb = (xbin_ref[0].astype(jnp.int32).astype(jnp.float32)
          .astype(jnp.bfloat16))                       # (KTO, 128)
    for ci in range(channels):
        fr = (frame_ref[0, ci].astype(jnp.int32).astype(jnp.float32)
              .astype(jnp.bfloat16))                   # (128, HP)
        cols_ref[ci] += jax.lax.dot(
            xb, fr, preferred_element_type=jnp.float32
        )

    @pl.when(wt == wt_last)
    def _finish():
        yb = (ybin_ref[0].astype(jnp.int32).astype(jnp.float32)
              .astype(jnp.bfloat16))                   # (HP, KTO)
        for ci in range(channels):
            cols = cols_ref[ci]                        # (KTO, HP) exact ints
            hi = jnp.floor(cols * (1.0 / 128.0))       # |hi| <= bin_w
            lo = cols - hi * 128.0                     # in [0, 127]
            acc = jax.lax.dot(
                hi.astype(jnp.bfloat16), yb,
                preferred_element_type=jnp.float32,
            ) * 128.0
            acc += jax.lax.dot(
                lo.astype(jnp.bfloat16), yb,
                preferred_element_type=jnp.float32,
            )
            out_ref[0, 0, ci] = acc                    # (KTO, KTO)


def crop_resize_area_fused(
    frames_p: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
    *,
    src_hw: tuple,
    kt: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact area crop-resize via the fused Pallas kernel.

    frames_p: (B, C, WP, HP) shifted int8 from
        :func:`prep_frames_for_fused_crops`.
    bounds: (B, K, 4) int32 half-open (x0, y0, x1, y1), clipped to the
        ORIGINAL frame (``src_hw``), e.g. from ops.boxes.pad_crop_bounds.
    src_hw: (H, W) of the unpadded frames.
    kt: crops per kernel tile (K % kt == 0).  Default targets KT*O = 384
        rows (three full MXU passes per dot).
    Returns (B, K, out_size, out_size, C) float32 in [0, 255] — bit-exact
    with ops.resize.crop_resize_area / crop_resize_area_mxu.
    """
    b, c, wp, hp = frames_p.shape
    assert frames_p.dtype == jnp.int8, frames_p.dtype
    h, w = src_hw
    k = bounds.shape[1]
    o = out_size
    if kt is None:
        kt = max(1, min(k, 384 // o))
    while k % kt:
        kt -= 1
    t = k // kt
    kto = kt * o
    wt_tiles = wp // 128

    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sy, ey = _bin_edges(y0[..., None], (y1 - y0)[..., None], o)  # (B, K, O)
    sx, ex = _bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    # Column indicator, bins-first: (B, K, O, WP) -> (B, K*O, WP).
    xbin = _bin_indicator(sx, ex, wp, o, jnp.int8,
                          bins_first=True).reshape(b, k * o, wp)
    # Row indicator, rows-first (no transpose): (B, HP, K*O).
    ys = jnp.arange(hp, dtype=jnp.int32).reshape(1, hp, 1, 1)
    ybin_t = jnp.logical_and(
        ys >= sy[:, None, :, :], ys < ey[:, None, :, :]
    ).astype(jnp.int8).reshape(b, hp, k * o)

    kernel = functools.partial(
        _crop_kernel, wt_last=wt_tiles - 1, channels=c,
    )
    raw = pl.pallas_call(
        kernel,
        grid=(b, t, wt_tiles),
        in_specs=[
            pl.BlockSpec((1, kto, 128), lambda i, j, s: (i, j, s)),
            pl.BlockSpec((1, c, 128, hp), lambda i, j, s: (i, 0, s, 0)),
            pl.BlockSpec((1, hp, kto), lambda i, j, s: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c, kto, kto), lambda i, j, s: (i, j, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c, kto, kto), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, kto, hp), jnp.float32)],
        interpret=interpret,
    )(xbin, frames_p, ybin_t)
    # raw rows = (k_local, ox), cols = (k_local', oy); keep the diagonal.
    r = raw.reshape(b, t, c, kt, o, kt, o)
    diag = jnp.diagonal(r, axis1=3, axis2=5)  # (B, T, C, O_x, O_y, KT)
    sums = jnp.transpose(diag, (0, 1, 5, 4, 3, 2)).reshape(b, k, o, o, c)
    # Un-shift + area division: identical to crop_resize_area's tail, so
    # results are bit-exact with the integral-image formulation.
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(
        jnp.float32
    )  # (B, K, O_y, O_x)
    sums = sums + 128.0 * area[..., None]
    mean = sums / jnp.maximum(area, 1.0)[..., None]
    return jnp.where(area[..., None] > 0, mean, 0.0)
