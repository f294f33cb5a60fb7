"""Pallas TPU kernel for batched bilinear crop-resize (face extraction).

Drop-in variant of ops.resize.crop_resize_bilinear (cv2.INTER_LINEAR
semantics over dynamic boxes, reference server/model.py:57).  Design, per
pallas_guide.md:

- One grid step per (frame, box, width-shard).  The frame rides into VMEM
  **planar** (C, H, W-shard) and uint8; the shard count is picked so a
  double-buffered shard fits the 16 MB VMEM budget next to the output
  staging (1080p -> 2 shards of 3.2 MB).  The index map is constant along
  the box axis, so a frame shard stays VMEM-resident across all K boxes of
  a frame instead of being re-fetched per box.
- The sampling coordinates are scalar-core math: for each output row the
  kernel dynamically slices an 8-aligned 16-row window from VMEM (`pl.ds`),
  rotates the wanted row pair to the top (`pltpu.roll`), blends on the VPU,
  and stores into a row-blended scratch.  Only ~2*out_size of the H rows
  are ever touched per box, like the XLA gather path — NOT a dense matmul
  over the frame (that would be ~1 GFLOP/box).
- The column interpolation is a single MXU matmul per channel against a
  two-nonzeros-per-column weight matrix built in-registers from iota — TPU
  gathers along lanes are slow; a (W, 128) matmul is not.  Width shards
  accumulate into the output block (each column's two source pixels may
  straddle a shard boundary; the weight matrix is zero outside the shard).

Mosaic quirks encoded here (found by probing this backend): no f32 iota
(int32 iota + cast), no uint8->f32 cast (hop through int32), no dynamic ref
loads inside lax loops (python-unrolled row loop), dynamic-slice starts
must be provably 8-aligned and in-bounds (clip-then-align, and no
jnp.minimum inside the index expression).

Semantics notes: half-pixel centers, clamp-to-edge, empty boxes -> zeros,
identical to the XLA path up to f32 rounding (the two paths associate the
lerp differently: ``t + (b-t)*f`` vs ``t*(1-f) + b*f``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target VMEM footprint for one (double-buffered) frame shard.  The scoped
# VMEM budget is 16 MB and must also hold the blend scratch, the column
# weights, and the parent computation's output staging.
_SHARD_BYTES = 3_400_000


def _crop_kernel(bounds_ref, frame_ref, out_ref, blend_ref, *,
                 num_boxes: int, height: int, width: int, out_size: int,
                 out_rows: int, out_lanes: int, channels: int):
    """One (frame, box, width-shard) program."""
    f32 = jnp.float32
    r = pl.program_id(0) * num_boxes + pl.program_id(1)
    shard = pl.program_id(2)
    x0 = bounds_ref[r, 0]
    y0 = bounds_ref[r, 1]
    x1 = bounds_ref[r, 2]
    y1 = bounds_ref[r, 3]
    ch = (y1 - y0).astype(f32)
    cw = (x1 - x0).astype(f32)
    nonempty = jnp.logical_and(y1 > y0, x1 > x0)
    wp = frame_ref.shape[-1]  # this shard's width
    col0 = shard * wp         # global column of this shard's first lane

    # Column-interpolation matrix Wx (wp, out_lanes): column j holds
    # (1-fx_j) at [global] row x_lo_j and fx_j at row x_hi_j; rows outside
    # this shard contribute zero, so shards sum to the full interpolation.
    # (int32 iota only: this Mosaic rejects f32 iota with a
    # 'tpu.iota must be vec' verifier error.)
    ji = jax.lax.broadcasted_iota(jnp.int32, (wp, out_lanes), 1)
    jf = ji.astype(f32)
    wgrid = jax.lax.broadcasted_iota(jnp.int32, (wp, out_lanes), 0) + col0
    sx = jnp.clip((jf + 0.5) * (cw / out_size) - 0.5, 0.0,
                  jnp.maximum(cw - 1.0, 0.0))
    ax = x0.astype(f32) + sx
    x_lo = jnp.floor(ax).astype(jnp.int32)
    fx = ax - x_lo.astype(f32)
    x_hi = jnp.clip(x_lo + 1, 0, width - 1)
    x_lo = jnp.clip(x_lo, 0, width - 1)
    wx = jnp.where(wgrid == x_lo, 1.0 - fx, 0.0) + jnp.where(
        wgrid == x_hi, fx, 0.0
    )
    live = jnp.logical_and(ji < out_size, nonempty)
    wx = jnp.where(live, wx, 0.0)

    y0f = y0.astype(f32)
    ch_top = jnp.maximum(ch - 1.0, 0.0)
    scale_y = ch / out_size
    hp = frame_ref.shape[-2]

    # Python-unrolled row loop: Mosaic crashes on dynamic ref loads inside
    # lax loops (and on unaligned dynamic sublane loads anywhere), so each
    # output row does one STATIC-index store and one 8-aligned 16-row
    # dynamic window load, rotating the wanted row pair to the top.
    for i in range(out_size):
        sy = jnp.clip((i + 0.5) * scale_y - 0.5, 0.0, ch_top)
        ay = y0f + sy
        y_lo = jnp.floor(ay).astype(jnp.int32)
        fy = ay - y_lo.astype(f32)
        base = jnp.clip(y_lo, 0, height - 2)
        # Clip first, then align: the window start must be provably aligned
        # AND bounded for Mosaic's dynamic-slice handling (jnp.minimum in
        # the index expression crashes this backend).
        a = (jnp.clip(base, 0, hp - 16) // 8) * 8
        top_at0 = jnp.clip(y_lo, 0, height - 1) == base
        bot_at0 = jnp.clip(y_lo + 1, 0, height - 1) == base
        for c in range(channels):
            win = frame_ref[0, c, pl.ds(a, 16), :]  # (16, wp)
            # Mosaic has no direct uint8->f32 cast; hop through int32.
            win = (win.astype(jnp.int32).astype(f32)
                   if win.dtype == jnp.uint8 else win.astype(f32))
            win = pltpu.roll(win, shift=-(base - a), axis=0)
            top = jnp.where(top_at0, win[0:1, :], win[1:2, :])
            bot = jnp.where(bot_at0, win[0:1, :], win[1:2, :])
            blend_ref[c, i : i + 1, :] = top * (1.0 - fy) + bot * fy

    for c in range(channels):
        if out_rows > out_size:
            blend_ref[c, out_size:out_rows, :] = jnp.zeros(
                (out_rows - out_size, wp), f32
            )
        acc = jax.lax.dot(
            blend_ref[c, :, :], wx,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )

        @pl.when(shard == 0)
        def _init(c=c, acc=acc):
            out_ref[0, 0, c] = acc

        @pl.when(shard > 0)
        def _accum(c=c, acc=acc):
            out_ref[0, 0, c] += acc


def crop_resize_bilinear_pallas(
    frames: jnp.ndarray,
    bounds: jnp.ndarray,
    out_size: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas variant of ops.resize.crop_resize_bilinear.

    frames: (B, H, W, C); bounds: (B, K, 4) int32 half-open (x0, y0, x1, y1).
    Returns (B, K, out_size, out_size, C) float32.
    """
    b, h, w, c = frames.shape
    k = bounds.shape[1]
    planar = jnp.transpose(frames, (0, 3, 1, 2))
    # uint8 tiles are (32, 128); pad H up so the whole frame is one block
    # and W up to a multiple of 128 * n_shards.
    hp = -(-max(h, 2) // 32) * 32
    itemsize = jnp.dtype(planar.dtype).itemsize
    n_shards = 1
    while c * hp * (-(-w // (128 * n_shards)) * 128) * itemsize > _SHARD_BYTES:
        n_shards *= 2
    wp = -(-w // (128 * n_shards)) * 128  # per-shard width
    planar = jnp.pad(
        planar, ((0, 0), (0, 0), (0, hp - h), (0, wp * n_shards - w))
    )
    out_rows = -(-out_size // 8) * 8
    out_lanes = -(-out_size // 128) * 128

    kernel = functools.partial(
        _crop_kernel,
        num_boxes=k, height=h, width=w, out_size=out_size,
        out_rows=out_rows, out_lanes=out_lanes, channels=c,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bounds ride in SMEM, readable pre-DMA
        grid=(b, k, n_shards),
        in_specs=[
            # Index map constant along the box axis: a frame shard stays
            # VMEM-resident across a frame's K boxes.
            pl.BlockSpec((1, c, hp, wp), lambda i, j, s, *_: (i, 0, 0, s)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c, out_rows, out_lanes),
            lambda i, j, s, *_: (i, j, 0, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((c, out_rows, wp), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, k, c, out_rows, out_lanes), jnp.float32
        ),
        interpret=interpret,
    )(bounds.astype(jnp.int32).reshape(b * k, 4), planar)
    return jnp.transpose(out[:, :, :, :out_size, :out_size], (0, 1, 3, 4, 2))
