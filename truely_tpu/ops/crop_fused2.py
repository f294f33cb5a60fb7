"""Fused Pallas stage-crop kernel, v2 — the whole exact area crop-resize
in one pass over the frames.

Why v2: the XLA two-matmul path (ops/resize.crop_resize_area_mxu) is
bit-exact but its (B, K*O, C, H) column-sum intermediate is ~2.5 GB at
1080p b128 and the compiled HLO materializes it THREE times (the dot
output plus two layout copies — measured ~59 ms of the ~72 ms in-situ crop
cost, scripts/probes/probe_step_trace.py).  The first fused kernel
(ops/crop_area_fused.py) kept the intermediate in VMEM but lost anyway:
it re-converted the frame tile per crop-tile, computed all (k, k')
cross-blocks at KT=16 (16x dot2 waste), and round-tripped a ~0.9 GB
mostly-garbage output.

This kernel:

- grid ``(B, C, W/WT)``, W innermost: each program dots the 0/1 column
  indicator (built IN-kernel from per-crop bin edges — nothing
  frame-sized enters or leaves but the frame itself) against one
  (WT, HP) frame tile, accumulating exact integer column sums into a
  (K*O, HP) f32 VMEM scratch.  The frame streams through HBM exactly
  once; the HBM intermediate never exists.
- on the last W tile, the H contraction runs per KT-crop tile: the f32
  sums split hi/lo (both halves exact bf16 — sums reach ~10k, past
  bf16's 2^8 exact-integer range), two MXU dots against the in-kernel
  row indicator, and only the block-diagonal (k == k') tiles are kept.
  KT is sized so KT*O = 192: cross-block waste is 8x on a contraction
  that is ~2% of dot1, and the output is the final (K, O, O) block.
- the -128 un-shift, area division, and empty-crop mask happen in XLA on
  the small (B, C, K, O, O) result — identical tail math to
  crop_resize_area, so results are BIT-EXACT with the integral-image
  formulation (pinned by tests/test_crop_fused2.py, interpret mode on CPU
  and compiled on TPU).

Reference semantics: these crops feed R-Net/O-Net exactly like
facenet_pytorch's ``imresample`` (area interpolation) of the per-box crop
regions inside ``MTCNN.detect`` (reference server/model.py:47).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from truely_tpu.ops.resize import _bin_edges


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def prep_frames_fused2(frames_chw: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) uint8 -> (B, C, WP, HP) shifted bf16, zero-padded.

    Shared by both stage-crop calls of a cascade step (one pass over the
    frames).  Shifted pixels (x - 128) are exact bf16 integers; the zero
    padding lies outside every clipped crop bin, contributing nothing.
    """
    b, c, h, w = frames_chw.shape
    assert frames_chw.dtype == jnp.uint8, frames_chw.dtype
    wp = _ceil_to(w, 256)
    hp = _ceil_to(h, 128)
    x = (frames_chw.astype(jnp.int32) - 128).astype(jnp.bfloat16)
    x = jnp.transpose(x, (0, 1, 3, 2))  # (B, C, W, H)
    return jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, hp - h)))


def _kernel(col_ref, row_ref, frame_ref, out_ref, cols_ref, *,
            wt: int, w_last: int, kt: int, o: int, hp: int):
    """One (frame, channel, W-tile) program.

    col_ref packs (sx, ex) as (K*O, 2) column vectors (per cols row);
    row_ref packs (sy, ey) as (2, K*O) row vectors (per dot2 output
    column) — both orientations are built in XLA so the kernel never
    transposes, and packing keeps the lane-padded VMEM footprint to one
    buffer per orientation."""
    wi = pl.program_id(2)

    @pl.when(wi == 0)
    def _zero():
        cols_ref[:] = jnp.zeros(cols_ref.shape, cols_ref.dtype)

    kto_all = cols_ref.shape[0]          # K * O
    # Column indicator for this W tile, built in-VMEM: row r = (k, ox)
    # covers columns [sx[r], ex[r]).  bool -> bf16 hops through int32/f32
    # (Mosaic has no direct bool/int8 -> bf16 cast on this backend).
    wcol = jax.lax.broadcasted_iota(jnp.int32, (kto_all, wt), 1) + wi * wt
    xbin = jnp.logical_and(wcol >= col_ref[:, 0:1], wcol < col_ref[:, 1:2])
    xbin = xbin.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    cols_ref[:] += jax.lax.dot(
        xbin, frame_ref[0, 0], preferred_element_type=jnp.float32
    )

    @pl.when(wi == w_last)
    def _finish():
        kto = kt * o
        hrow = jax.lax.broadcasted_iota(jnp.int32, (hp, kto), 0)
        for t in range(kto_all // kto):
            lo_t, hi_t = t * kto, (t + 1) * kto
            # Row indicator (HP, KTO) for this crop tile: column j = (k, oy)
            # covers rows [sy[j], ey[j]).
            sy = row_ref[0:1, lo_t:hi_t]
            ey = row_ref[1:2, lo_t:hi_t]
            ybin = jnp.logical_and(hrow >= sy, hrow < ey)
            ybin = (ybin.astype(jnp.int32).astype(jnp.float32)
                    .astype(jnp.bfloat16))
            cols = cols_ref[lo_t:hi_t]                  # (KTO, HP) exact ints
            hi_half = jnp.floor(cols * (1.0 / 128.0))   # |hi| <= bin_w
            lo_half = cols - hi_half * 128.0            # in [0, 127]
            cross = jax.lax.dot(
                hi_half.astype(jnp.bfloat16), ybin,
                preferred_element_type=jnp.float32,
            ) * 128.0
            cross += jax.lax.dot(
                lo_half.astype(jnp.bfloat16), ybin,
                preferred_element_type=jnp.float32,
            )                                           # (KTO, KTO)
            for j in range(kt):
                k = t * kt + j
                out_ref[0, 0, k] = cross[j * o:(j + 1) * o, j * o:(j + 1) * o]


def crop_resize_area_fused2(
    frames_p: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
    *,
    src_hw: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact area crop-resize via the v2 fused kernel.

    frames_p: (B, C, WP, HP) shifted bf16 from :func:`prep_frames_fused2`.
    bounds: (B, K, 4) int32 half-open (x0, y0, x1, y1) clipped to the
        ORIGINAL frame (``src_hw``), e.g. from ops.boxes.pad_crop_bounds.
    Returns (B, K, out_size, out_size, C) float32 in [0, 255] — bit-exact
    with ops.resize.crop_resize_area / crop_resize_area_mxu.
    """
    b, c, wp, hp = frames_p.shape
    assert frames_p.dtype == jnp.bfloat16, frames_p.dtype
    h, w = src_hw
    k = bounds.shape[1]
    o = out_size
    kt = max(1, 192 // o)
    while k % kt:
        kt -= 1
    wt = 256
    w_tiles = wp // wt

    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sy, ey = _bin_edges(y0[..., None], (y1 - y0)[..., None], o)  # (B, K, O)
    sx, ex = _bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    edges_col = jnp.stack(
        [sx.reshape(b, k * o), ex.reshape(b, k * o)], axis=-1)   # (B, K*O, 2)
    edges_row = jnp.stack(
        [sy.reshape(b, k * o), ey.reshape(b, k * o)], axis=1)    # (B, 2, K*O)

    kernel = functools.partial(
        _kernel, wt=wt, w_last=w_tiles - 1, kt=kt, o=o, hp=hp,
    )
    edge_spec = pl.BlockSpec((None, k * o, 2), lambda i, ci, s: (i, 0, 0))
    row_spec = pl.BlockSpec((None, 2, k * o), lambda i, ci, s: (i, 0, 0))
    raw = pl.pallas_call(
        kernel,
        grid=(b, c, w_tiles),
        in_specs=[
            edge_spec, row_spec,
            pl.BlockSpec((1, 1, wt, hp), lambda i, ci, s: (i, ci, s, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, k, o, o), lambda i, ci, s: (i, ci, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, k, o, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k * o, hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(edges_col, edges_row, frames_p)
    # raw: (B, C, K, O_x, O_y) -> (B, K, O_y, O_x, C); un-shift + divide
    # identical to crop_resize_area's tail (bit-exact).
    sums = jnp.transpose(raw, (0, 2, 4, 3, 1))
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(
        jnp.float32
    )  # (B, K, O_y, O_x)
    sums = sums + 128.0 * area[..., None]
    mean = sums / jnp.maximum(area, 1.0)[..., None]
    return jnp.where(area[..., None] > 0, mean, 0.0)
