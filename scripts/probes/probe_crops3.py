"""Stage-crop W-contraction, int8 MXU variant in the CURRENT 4-D-LHS shape.

Finding 10 measured int8 losing (46 vs 34.5 ms) in the PRE-4-D-LHS code
shape, where the int32 intermediate picked up an extra convert round trip.
The 4-D-LHS commit (f6d67c6) killed that path's layout copies for f32;
re-measure whether an int8 W-dot (2x MXU rate; exact: shifted u8 pixels and
0/1 indicators are exact int8, bin sums < 2^31) now wins when the H-dot
consumes the int32 output with an inline convert.

Shapes = production 1080p b128: R-Net (K=64, O=24) + O-Net (K=32, O=48).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.ops.resize import _bin_edges, _bin_indicator  # noqa: E402

B, H, W = 128, 1080, 1920
rng = np.random.default_rng(0)


def make_inputs(k, o):
    frames = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8)
    )
    x0 = rng.integers(0, W - 512, (B, k)).astype(np.int32)
    y0 = rng.integers(0, H - 512, (B, k)).astype(np.int32)
    span = rng.integers(24, 512, (B, k)).astype(np.int32)
    bounds = np.stack([x0, y0, x0 + span, y0 + span], axis=-1)
    return frames, jnp.asarray(bounds)


def wdot_bf16(frames, bounds, o):
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sx, ex = _bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    xbin = _bin_indicator(sx, ex, W, o, jnp.bfloat16, bins_first=True)
    pix = (frames.astype(jnp.int32) - 128).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        xbin, pix, dimension_numbers=(((3,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def wdot_int8(frames, bounds, o):
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sx, ex = _bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    xbin = _bin_indicator(sx, ex, W, o, jnp.int8, bins_first=True)
    pix = (frames.astype(jnp.int32) - 128).astype(jnp.int8)
    return jax.lax.dot_general(
        xbin, pix, dimension_numbers=(((3,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def full_bf16(frames, bounds, o):
    cols = wdot_bf16(frames, bounds, o)
    y0, y1 = bounds[..., 1], bounds[..., 3]
    sy, ey = _bin_edges(y0[..., None], (y1 - y0)[..., None], o)
    ybin = _bin_indicator(sy, ey, H, o, jnp.float32, bins_first=True)
    return jax.lax.dot_general(
        cols, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def full_int8(frames, bounds, o):
    cols = wdot_int8(frames, bounds, o).astype(jnp.float32)
    y0, y1 = bounds[..., 1], bounds[..., 3]
    sy, ey = _bin_edges(y0[..., None], (y1 - y0)[..., None], o)
    ybin = _bin_indicator(sy, ey, H, o, jnp.float32, bins_first=True)
    return jax.lax.dot_general(
        cols, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


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
    for name, k, o in [("rnet", 64, 24), ("onet", 32, 48)]:
        frames, bounds = make_inputs(k, o)
        jax.block_until_ready((frames, bounds))
        t_bf = timeit(lambda f, b: full_bf16(f, b, o), frames, bounds)
        t_i8 = timeit(lambda f, b: full_int8(f, b, o), frames, bounds)
        a = np.asarray(jax.jit(lambda f, b: full_bf16(f, b, o))(frames, bounds))
        c = np.asarray(jax.jit(lambda f, b: full_int8(f, b, o))(frames, bounds))
        # compare: int8 path sums shifted pixels; undo shift via area
        print(
            f"{name}: bf16 {t_bf*1e3:6.1f} ms  int8 {t_i8*1e3:6.1f} ms  "
            f"bitexact={np.array_equal(a, c)}",
            flush=True,
        )
