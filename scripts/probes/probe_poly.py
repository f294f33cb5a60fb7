"""Polyphase (rational-scale) level-0 pyramid resample vs the dense dots.

The production level-0 resample (1080p -> 649x1153, the only full-frame
contraction left in the pyramid) is FLOP-bound dense dots (~12 ms at b128,
PERFORMANCE.md breakdown).  The schedule's `int(dim*scale+1)` is what makes
it dense: 649 is coprime with 1080.  Snapping ONE pixel (649->648,
1153->1152) makes the scale exactly 3/5, and the adaptive-pool bins become
block-local (every 5 input rows -> 3 output rows, bins never straddle
blocks), so each pass is a reshape + (3,5) dot: FLOPs / ~200, same exact
area semantics at the snapped size.

Variants measured at 1080p b128 u8 -> bf16:
  dense649   resize_area to (649, 1153)  [current production level 0]
  dense648   resize_area to (648, 1152)  [snapped size, dense dots]
  poly       block einsum, H-pass then W-pass
  poly_w1st  block einsum, W-pass then H-pass
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.ops.resize import _area_matrix, resize_area  # noqa: E402

B, H, W = 128, 1080, 1920
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def block_matrix(in_size, out_size):
    """(p, q) block of the area matrix; bins are block-local when the full
    matrix is block-diagonal with this tile, which holds for any rational
    in/out (each block of p output bins exactly tiles q input columns)."""
    g = math.gcd(in_size, out_size)
    q, p = in_size // g, out_size // g
    full = np.asarray(_area_matrix(in_size, out_size, dtype=jnp.float32))
    tile = full[:p, :q]
    # verify block-diagonal structure
    for t in range(min(g, 7)):
        blk = full[t * p:(t + 1) * p, t * q:(t + 1) * q]
        assert np.array_equal(blk, tile), t
    return q, p, tile


QH, PH, MH = block_matrix(H, 648)
QW, PW, MW = block_matrix(W, 1152)


def poly_h(x, dt=DT):
    b, h, w, c = x.shape
    t = h // QH
    xr = x.reshape(b, t, QH, w, c).astype(dt)
    y = jnp.einsum("pq,btqwc->btpwc", jnp.asarray(MH, dt), xr)
    return y.reshape(b, t * PH, w, c)


def poly_w(x, dt=DT):
    b, h, w, c = x.shape
    t = w // QW
    xr = x.reshape(b, h, t, QW, c).astype(dt)
    y = jnp.einsum("pq,bhtqc->bhtpc", jnp.asarray(MW, dt), xr)
    return y.reshape(b, h, t * PW, c)


def poly(x):
    return poly_w(poly_h(x))


def poly_w1st(x):
    return poly_h(poly_w(x))


def dense(x, oh, ow):
    return resize_area(x, (oh, ow), precision=jax.lax.Precision.DEFAULT,
                       dtype=DT)


def timeit(fn, *args):
    jf = jax.jit(fn)

    def chain(n):
        t0 = time.perf_counter()
        a = args[0]
        for _ in range(n):
            out = jf(a, *args[1:])
            s = out[(0,) * out.ndim]
            a = args[0] ^ (s.astype(jnp.int32) % 2).astype(jnp.uint8)
        float(s)
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(5) - chain(2)) / 3 for _ in range(3))


if __name__ == "__main__":
    # Exactness on a small case first (f32): poly == dense at the snapped
    # size, bit-for-bit (the dense dot's extra terms are exact *0 adds).
    xs = jnp.asarray(rng.integers(0, 256, (2, 30, 40, 3), np.uint8))
    qh, ph, mh = block_matrix(30, 18)
    qw, pw, mw = block_matrix(40, 24)

    def poly_small(v):
        b, h, w, c = v.shape
        y = jnp.einsum("pq,btqwc->btpwc", jnp.asarray(mh, jnp.float32),
                       v.reshape(b, h // qh, qh, w, c).astype(jnp.float32))
        y = y.reshape(b, 18, w, c)
        z = jnp.einsum("pq,bhtqc->bhtpc", jnp.asarray(mw, jnp.float32),
                       y.reshape(b, 18, w // qw, qw, c))
        return z.reshape(b, 18, 24, c)

    a = np.asarray(resize_area(xs, (18, 24)))
    bb = np.asarray(jax.jit(poly_small)(xs))
    print("poly == dense (f32 small):", np.array_equal(a, bb),
          "max err", np.abs(a - bb).max(), flush=True)

    x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))
    jax.block_until_ready(x)

    for name, fn in [
        ("dense649", lambda v: dense(v, 649, 1153)),
        ("dense648", lambda v: dense(v, 648, 1152)),
        ("poly", poly),
        ("poly_w1st", poly_w1st),
    ]:
        t = timeit(fn, x)
        print(f"{name:10s} {t*1e3:6.2f} ms", flush=True)
