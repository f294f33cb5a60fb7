"""Pallas-fused i420->BGR conversion vs the XLA formulation (ops/yuv.py).

The XLA version costs ~18-26 ms/step at 1080p b128 (probe_yuv_trace): the
2x2 chroma-upsample broadcast-reshapes act as fusion barriers, so XLA
materializes the int16 luma ramp and the three upsampled chroma terms at
(B, H, W) scale plus the final interleaved stack.  A Pallas kernel does
the affine + row-replication + clip in one VMEM pass per row-strip.

Mosaic quirks found while building this (2026-08-19, service otherwise
healthy — the round-2 "no dot kernels compile" blocker has LIFTED,
re-verified with novel-shape gridded dot+epilogue kernels):
  - jnp.repeat(axis=<lane>) does not compile (HTTP 500); axis=0
    (sublane) compiles and is elementwise.  pltpu.repeat compiles on both
    axes but is TILE-repeat ([a,b,a,b]), not elementwise.
    => chroma is lane-doubled OUTSIDE the kernel (cheap u8 XLA repeat at
    half resolution), row-doubled INSIDE via jnp.repeat(axis=0).
  - int16 -> uint8 casts do not compile (HTTP 500) even via min/max;
    int32 clip -> uint8 compiles.  => all in-kernel arithmetic stays i32
    (VMEM-resident, so the int16 HBM-narrowing trick is irrelevant here).

Variants:
  A: XLA baseline (ops.yuv.i420_to_bgr)
  B: Pallas kernel emitting (B, H, 3, W) + jnp.transpose outside
  C: Pallas kernel emitting (B, H, W, 3) directly (last dim 3: lane-hostile)
  D: variant B without the transpose (kernel-only cost, planar consumer)

All variants are checked for EXACT equality against A (the conversion is
integer fixed-point; any drift is a bug).  Run: timeout 560, foreground.
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from truely_tpu.ops.yuv import i420_to_bgr

B, H, W = 128, 1080, 1920
# luma rows per block: HT % 16 == 0 so the chroma block (HT/2) keeps the
# (8, 128) sublane rule; 1080 has no multiple-of-16 divisor, so the grid
# uses cdiv and Pallas masks the edge block.
HT = int(os.environ.get("HT", "80"))


def _kernel(y_ref, u_ref, v_ref, o_ref, *, interleaved):
    y = y_ref[0].astype(jnp.int32)
    q = (y * 76305 - 1219995) >> 16              # (HT, W)
    uu = u_ref[0].astype(jnp.int32)              # (HT/2, W) lane-doubled
    vv = v_ref[0].astype(jnp.int32)

    def up(t):  # row-double (elementwise)
        return jnp.repeat(t, 2, axis=0)

    tb = up((uu * 132193 - 16920704) >> 16)
    tg = up(((uu * -25673 + 3286144) >> 16) + ((vv * -53281 + 6819968) >> 16))
    tr = up((vv * 104593 - 13387904) >> 16)

    def chan(t):
        return jnp.clip(q + t, 0, 255).astype(jnp.uint8)

    bb, gg, rr = chan(tb), chan(tg), chan(tr)
    if interleaved:
        o_ref[0, :, :, 0] = bb
        o_ref[0, :, :, 1] = gg
        o_ref[0, :, :, 2] = rr
    else:
        # (1, 3, HT, W) block: channel is an OUTER dim, so the tiled
        # last-two dims are (HT, W) — a (.., 3, W) output block pads the
        # 3-sublane dim to 8 and inflates the whole output 2.67x in HBM.
        o_ref[0, 0] = bb
        o_ref[0, 1] = gg
        o_ref[0, 2] = rr


def _split(packed):
    """(y, u2, v2): y full-res; chroma lane-doubled to (B, H/2, W) in XLA
    (a cheap u8 pass at half resolution — the expensive part, the row
    doubling and the int32 affine material, stays inside the kernel)."""
    b, h32, w = packed.shape
    h = h32 * 2 // 3
    y = packed[:, :h, :]
    u = packed[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v = packed[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
    return y, jnp.repeat(u, 2, axis=2), jnp.repeat(v, 2, axis=2)


def _mk_pallas(interleaved):
    from functools import partial

    grid = (B, pl.cdiv(H, HT))
    in_specs = [
        pl.BlockSpec((1, HT, W), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HT // 2, W), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HT // 2, W), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if interleaved:
        out_spec = pl.BlockSpec((1, HT, W, 3), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8)
    else:
        out_spec = pl.BlockSpec((1, 3, HT, W), lambda i, j: (i, 0, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, 3, H, W), jnp.uint8)

    call = pl.pallas_call(
        partial(_kernel, interleaved=interleaved),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
    )

    def f(packed):
        return call(*_split(packed))

    return f


def timeit(name, jf, packed, n_lo=2, n_hi=6, trials=3):
    def chain(n):
        a = packed
        t0 = time.perf_counter()
        s = None
        for _ in range(n):
            out = jf(a)
            s = out[(0,) * out.ndim]  # scalar tap, no reshape/copy
            a = packed ^ (s.astype(jnp.int32) % 2).astype(jnp.uint8)
        int(s)  # force the whole chain
        return time.perf_counter() - t0

    chain(1)
    chain(1)
    per = min(
        (chain(n_hi) - chain(n_lo)) / (n_hi - n_lo) for _ in range(trials)
    )
    print(f"{name:32s} {per*1e3:8.2f} ms/step", flush=True)
    return per


if __name__ == "__main__":
    print("devices:", jax.devices(), "HT:", HT, flush=True)
    rng = np.random.default_rng(0)
    packed_h = rng.integers(0, 256, (B, H * 3 // 2, W), np.uint8)
    packed = jax.device_put(jnp.asarray(packed_h))

    base = jax.jit(lambda p: i420_to_bgr(p))
    ref = np.asarray(jax.device_get(base(packed)))

    variants = {}
    fB = jax.jit(lambda p: jnp.transpose(_mk_pallas(False)(p), (0, 2, 3, 1)))
    fC = jax.jit(_mk_pallas(True))
    fD = jax.jit(_mk_pallas(False))

    for name, f, to_iv in (
        ("B pallas (B,3,H,W)+transpose", fB, None),
        ("C pallas (B,H,W,3) direct", fC, None),
        ("D pallas planar, no transpose", fD,
         lambda a: np.transpose(a, (0, 2, 3, 1))),
    ):
        try:
            out = np.asarray(jax.device_get(f(packed)))
            if to_iv is not None:
                out = to_iv(out)
            exact = np.array_equal(out, ref)
            print(f"{name:32s} exact={exact}", flush=True)
            if exact:
                variants[name] = f
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__} {str(e)[:160]}",
                  flush=True)

    timeit("A xla i420_to_bgr", base, packed)
    for name, f in variants.items():
        timeit(name, f, packed)
