"""TPU validation of crop_area_fused: bit-exactness vs crop_resize_area_mxu
at production shapes + forced-execution timing (fused vs mxu, incl. prep).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from truely_tpu.ops.resize import crop_resize_area_mxu
from truely_tpu.ops.crop_area_fused import (
    crop_resize_area_fused, prep_frames_for_fused_crops)
from truely_tpu.ops.boxes import pad_crop_bounds
from truely_tpu.pipeline.detector import _enable_compilation_cache

_enable_compilation_cache()

B, H, W = 128, 1080, 1920
rng = np.random.default_rng(0)
frames_chw = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (B, 3, H, W), np.uint8)))


def make_bounds(k):
    x0 = rng.uniform(0, W - 250, (B, k))
    y0 = rng.uniform(0, H - 250, (B, k))
    s = rng.uniform(20, 240, (B, k))
    boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), jnp.float32)
    return jax.device_put(pad_crop_bounds(boxes, W, H))


def tap(y):
    return jnp.sum(y.reshape(-1)[:8].astype(jnp.float32))


def slope(f, x):
    jf = jax.jit(lambda x: tap(f(x)))
    mixed = jax.jit(lambda x, s: x ^ (s.astype(jnp.int32) % 2).astype(x.dtype))

    def chain(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            v = jf(xx)
            xx = mixed(x, v)
        float(v)
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(7) - chain(2)) / 5 for _ in range(3))


prep = jax.jit(prep_frames_for_fused_crops)

for k, o in [(64, 24), (32, 48)]:
    bounds = make_bounds(k)

    # Bit-exactness check first.
    mxu = jax.jit(lambda f, b: crop_resize_area_mxu(f, b, o))(
        frames_chw, bounds)
    fused = jax.jit(
        lambda f, b: crop_resize_area_fused(
            prep_frames_for_fused_crops(f), b, o, src_hw=(H, W))
    )(frames_chw, bounds)
    a = np.asarray(jax.device_get(mxu[:4]))
    bb = np.asarray(jax.device_get(fused[:4]))
    exact = np.array_equal(a, bb)
    print(f"K={k} O={o}: bit_exact(first4)={exact} "
          f"maxdiff={np.abs(a - bb).max()}", flush=True)

    t_mxu = slope(lambda f: crop_resize_area_mxu(f, bounds, o), frames_chw)
    t_fused = slope(
        lambda f: crop_resize_area_fused(
            prep_frames_for_fused_crops(f), bounds, o, src_hw=(H, W)),
        frames_chw)
    print(f"K={k} O={o}: mxu={t_mxu*1e3:7.2f} ms  "
          f"fused(incl prep)={t_fused*1e3:7.2f} ms", flush=True)

t_prep = slope(lambda f: prep_frames_for_fused_crops(f), frames_chw)
print(f"prep alone: {t_prep*1e3:7.2f} ms", flush=True)
