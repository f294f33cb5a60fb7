"""Two follow-ups from the post-quant-crop step trace (finding 12):

1. block_sum_frames (the q=4 downsample feeding the quantized crops)
   costs ~8.1 ms/step as two dots (fusion.66 writes a 796 MB f32
   intermediate).  A reduce_window 4x4/4 sum is bandwidth-bound
   (~0.96 GB total) — measure both, check bit-equality.

2. The level-0 pyramid resample (1080p -> 649x1153, the cascade's only
   full-frame contraction) costs ~12.2 ms/step in bf16.  resize_area_u8
   (int8 MXU, exact integer bin sums) exists for the non-cascade path —
   measure it on just level 0.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from truely_tpu.ops.resize import (  # noqa: E402
    block_sum_frames, resize_area, resize_area_u8,
)

B, H, W = 128, 1080, 1920
rng = np.random.default_rng(0)


def block_sum_rw(frames_chw, q):
    acc = frames_chw.astype(jnp.float32)
    return lax.reduce_window(
        acc, 0.0, lax.add, (1, 1, q, q), (1, 1, q, q), "VALID"
    )


def block_sum_rw_u8int(frames_chw, q):
    acc = frames_chw.astype(jnp.int32)
    return lax.reduce_window(
        acc, 0, lax.add, (1, 1, q, q), (1, 1, q, q), "VALID"
    ).astype(jnp.float32)


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
    frames_chw = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
    frames_hwc = jnp.asarray(
        rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    jax.block_until_ready((frames_chw, frames_hwc))

    a = np.asarray(jax.jit(lambda f: block_sum_frames(f, 4))(frames_chw))
    b = np.asarray(jax.jit(lambda f: block_sum_rw(f, 4))(frames_chw))
    print("rw f32 bit-equal dots:", np.array_equal(a, b), flush=True)

    t_dots = timeit(lambda f: block_sum_frames(f, 4), frames_chw)
    t_rw = timeit(lambda f: block_sum_rw(f, 4), frames_chw)
    t_rwi = timeit(lambda f: block_sum_rw_u8int(f, 4), frames_chw)
    print(f"block_sum dots {t_dots*1e3:6.1f} ms  rw_f32 {t_rw*1e3:6.1f} ms  "
          f"rw_int {t_rwi*1e3:6.1f} ms", flush=True)

    lvl = (649, 1153)
    t_bf = timeit(
        lambda f: resize_area(f, lvl, precision=lax.Precision.DEFAULT,
                              dtype=jnp.bfloat16), frames_hwc)
    t_i8 = timeit(lambda f: resize_area_u8(f, lvl), frames_hwc)
    print(f"level0 resample bf16 {t_bf*1e3:6.1f} ms  int8 {t_i8*1e3:6.1f} ms",
          flush=True)
