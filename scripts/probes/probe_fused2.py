"""v2 fused crop kernel on the real chip: compiled bit-exactness vs the
XLA bin-indicator path + slope timing at production shapes (1080p b128,
K=64 O=24 and K=32 O=48).  Includes the frame prep in the timed region
for an apples-to-apples comparison (the XLA path's pix convert is inside
crop_resize_area_mxu)."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np
import jax
import jax.numpy as jnp

from truely_tpu.ops.boxes import pad_crop_bounds
from truely_tpu.ops.crop_fused2 import (
    crop_resize_area_fused2, prep_frames_fused2,
)
from truely_tpu.ops.resize import crop_resize_area_mxu

B, H, W = 128, 1080, 1920


def tap(y):
    return jnp.sum(y.reshape(-1)[:8].astype(jnp.float32))


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


print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
frames_chw = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (B, 3, H, W), np.uint8)))
jax.block_until_ready(frames_chw)

if __name__ == "__main__" and "--extra" not in sys.argv:

    for k, o in [(64, 24), (32, 48)]:
        x0 = rng.uniform(0, W - 250, (B, k))
        y0 = rng.uniform(0, H - 250, (B, k))
        s = rng.uniform(20, 240, (B, k))
        boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1),
                            jnp.float32)
        bounds = jax.device_put(pad_crop_bounds(boxes, W, H))
        jax.block_until_ready(bounds)

        # Compiled bit-exactness on a slice.
        ref = np.asarray(jax.jit(
            lambda f, b: crop_resize_area_mxu(f, b, o))(
                frames_chw[:4], bounds[:4]))
        got = np.asarray(jax.jit(
            lambda f, b: crop_resize_area_fused2(
                prep_frames_fused2(f), b, o, src_hw=(H, W)))(
                frames_chw[:4], bounds[:4]))
        print(f"K={k} O={o} compiled bit-exact: {np.array_equal(got, ref)} "
              f"maxdiff={np.abs(got - ref).max():.3g}", flush=True)

        t_xla = slope(lambda f: crop_resize_area_mxu(f, bounds, o),
                      frames_chw)
        t_f2 = slope(lambda f: crop_resize_area_fused2(
            prep_frames_fused2(f), bounds, o, src_hw=(H, W)), frames_chw)
        print(f"K={k} O={o}: xla {t_xla*1e3:7.2f} ms   fused2 "
              f"{t_f2*1e3:7.2f} ms", flush=True)

    # Both stages sharing one prep (what detect_faces would do).
    x0 = rng.uniform(0, W - 250, (B, 64)); y0 = rng.uniform(0, H - 250, (B, 64))
    s = rng.uniform(20, 240, (B, 64))
    b2 = jax.device_put(pad_crop_bounds(jnp.asarray(
        np.stack([x0, y0, x0 + s, y0 + s], -1), jnp.float32), W, H))
    b3 = jax.device_put(b2[:, :32])

    def both(f):
        fp = prep_frames_fused2(f)
        c2 = crop_resize_area_fused2(fp, b2, 24, src_hw=(H, W))
        c3 = crop_resize_area_fused2(fp, b3, 48, src_hw=(H, W))
        return tap(c2) + tap(c3)

    t_both = slope(both, frames_chw)
    print(f"both stages, shared prep: {t_both*1e3:7.2f} ms", flush=True)


def v_4d(frames_chw, bounds, o):
    """XLA variant: 4-D LHS W-dot emits (B,K,O,C,H) directly — no post-dot
    reshape (the reshape after the 3-D-LHS dot costs a full layout copy of
    the 2.5 GB intermediate in the compiled HLO)."""
    import truely_tpu.ops.resize as _rz
    b, c, h, w = frames_chw.shape
    k = bounds.shape[1]
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sy, ey = _rz._bin_edges(y0[..., None], (y1 - y0)[..., None], o)
    sx, ex = _rz._bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    ybin = _rz._bin_indicator(sy, ey, h, o, jnp.float32, bins_first=True)
    xbin = _rz._bin_indicator(sx, ex, w, o, jnp.bfloat16, bins_first=True)
    pix = (frames_chw.astype(jnp.int32) - 128).astype(jnp.bfloat16)
    cols = jax.lax.dot_general(
        xbin, pix,                                   # (B,K,O,W) x (B,C,H,W)
        dimension_numbers=(((3,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                # (B,K,O,C,H)
    sums = jax.lax.dot_general(
        cols, ybin,
        dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sums = sums.transpose(0, 1, 4, 2, 3)
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(jnp.float32)
    sums = sums + 128.0 * area[..., None]
    mean = sums / jnp.maximum(area, 1.0)[..., None]
    return jnp.where(area[..., None] > 0, mean, 0.0)


if "--extra" in sys.argv:
    rng = np.random.default_rng(0)
    for k, o in [(64, 24), (32, 48)]:
        x0 = rng.uniform(0, W - 250, (B, k))
        y0 = rng.uniform(0, H - 250, (B, k))
        s = rng.uniform(20, 240, (B, k))
        boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), jnp.float32)
        bounds = jax.device_put(pad_crop_bounds(boxes, W, H))
        ref = np.asarray(jax.jit(lambda f, b: crop_resize_area_mxu(f, b, o))(
            frames_chw[:4], bounds[:4]))
        got = np.asarray(jax.jit(lambda f, b: v_4d(f, b, o))(
            frames_chw[:4], bounds[:4]))
        print(f"v_4d K={k} O={o} bit-exact: {np.array_equal(got, ref)}",
              flush=True)
        t = slope(lambda f: v_4d(f, bounds, o), frames_chw)
        print(f"v_4d K={k} O={o}: {t*1e3:7.2f} ms", flush=True)
