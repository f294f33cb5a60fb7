"""Pyramid resample variants at b128 1080p, all 12 levels — hunting a
replacement for resize_area_u8 (58 ms in situ; the plain f32-DEFAULT
two-pass measures 42 ms, so the int8-exact machinery's extra traffic
costs more than its 2x MXU rate buys).

Variants:
  u8        current production (int8 MXU, exact integer bins)
  bf16      resize_area dtype=bf16 (DEFAULT precision, half the traffic)
  bf16_all1 ONE H-pass over all levels' stacked row indicators (frame read
            once), then per-level W-passes on row slices
  bf16_casc each level resized from the PREVIOUS level (geometric FLOPs)
  take_rows static row-gather speed: jnp.take along H with constant
            indices (feasibility of a sparse 2-3-tap formulation)
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

from truely_tpu.ops.resize import (
    _area_matrix, resize_area, resize_area_u8,
)
from truely_tpu.pipeline.pyramid import pyramid_schedule

B, H, W = 128, 1080, 1920
DT = jnp.bfloat16
LEVELS = [(l.height, l.width) for l in pyramid_schedule(1080, 1920, 20, 0.709)]


def tap(y):
    leaves = jax.tree_util.tree_leaves(y)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32))
    return acc


def slope(f, x):
    jf = jax.jit(lambda x: tap(f(x)))
    mix = jax.jit(lambda x, s: x ^ (s.astype(jnp.int32) % 2).astype(x.dtype))

    def chain(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            v = jf(xx)
            xx = mix(x, v)
        float(v)
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(7) - chain(2)) / 5 for _ in range(3))


def v_u8(f):
    return sum(resize_area_u8(f, hw).astype(jnp.float32).sum() for hw in LEVELS)


def v_bf16(f):
    return sum(
        resize_area(f, hw, precision=jax.lax.Precision.DEFAULT, dtype=DT)
        .astype(jnp.float32).sum()
        for hw in LEVELS
    )


def v_bf16_all1(f):
    # One stacked H-pass: frame read once; W-passes on row slices.
    rhs = [np.asarray(_area_matrix(H, oh, dtype=jnp.float32)) for oh, _ in LEVELS]
    r_all = jnp.asarray(np.concatenate(rhs, 0), DT)           # (sumOH, H)
    y = jnp.einsum("oh,bhwc->bowc", r_all, f.astype(DT))       # (B, sumOH, W, C)
    acc = jnp.zeros((), jnp.float32)
    off = 0
    for oh, ow in LEVELS:
        rw = _area_matrix(W, ow, dtype=DT)
        z = jnp.einsum("pw,bowc->bopc", rw, y[:, off:off + oh])
        acc = acc + z.astype(jnp.float32).sum()
        off += oh
    return acc


def v_bf16_casc(f):
    # Each level from the previous (approximate: bin edges re-derived in the
    # previous level's grid — NOT exact area semantics vs the original).
    acc = jnp.zeros((), jnp.float32)
    src = f.astype(DT)
    for hw in LEVELS:
        src = resize_area(src, hw, precision=jax.lax.Precision.DEFAULT, dtype=DT)
        acc = acc + src.astype(jnp.float32).sum()
    return acc


def v_take_rows(f):
    # Feasibility: static row gathers (H axis) at level-0/1 row counts.
    idx0 = jnp.asarray(np.linspace(0, H - 2, 649).astype(np.int32))
    idx1 = jnp.asarray(np.linspace(0, H - 2, 460).astype(np.int32))
    g0 = jnp.take(f, idx0, axis=1)
    g1 = jnp.take(f, idx1, axis=1)
    return g0.astype(jnp.float32).sum() + g1.astype(jnp.float32).sum()


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8)))
    jax.block_until_ready(frames)
    variants = {
        "u8": v_u8, "bf16": v_bf16, "bf16_all1": v_bf16_all1,
        "bf16_casc": v_bf16_casc, "take_rows": v_take_rows,
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        try:
            t = slope(variants[name], frames)
            print(f"{name:12s} {t*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:12s} FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
