"""Stage-crop variants at b128 1080p (K=64, O=24 — the R-Net shape; K*O
matches the O-Net stage too): can the int32 cols intermediate round-trip
(2.55 GB written, read, rewritten as f32, reread — ~40% of the crop cost)
be removed?

  cur      production crop_resize_area_mxu (int8 W-dot -> int32 -> f32
           convert -> f32 HIGHEST H-dot)
  f32dot   W-dot emits f32 directly (preferred_element_type=f32 on the
           int8 operands; exact if the backend accumulates exactly —
           verified against cur)
  i16      W-dot epilogue casts to int16 (exact: |cols| <= 128*80), the
           f32 convert feeds the H-dot
  bf16dot  W-dot with bf16 operands, f32 accumulation (exact products,
           f32 accum; half the int8 MXU rate but no convert pass)
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

import truely_tpu.ops.resize as _rz
from truely_tpu.ops.boxes import pad_crop_bounds

B, H, W = 128, 1080, 1920
K, O = 64, 24


def tap(y):
    leaves = jax.tree_util.tree_leaves(y)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32))
    return acc


def slope(f, *xs):
    jf = jax.jit(lambda *xs: tap(f(*xs)))
    mix = jax.jit(lambda x, s: x ^ (s.astype(jnp.int32) % 2).astype(x.dtype))

    def chain(n):
        xx = xs
        t0 = time.perf_counter()
        for _ in range(n):
            v = jf(*xx)
            xx = (mix(xs[0], v),) + xs[1:]
        float(v)
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(7) - chain(2)) / 5 for _ in range(3))


def edges(bounds):
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sy, ey = _rz._bin_edges(y0[..., None], (y1 - y0)[..., None], O)
    sx, ex = _rz._bin_edges(x0[..., None], (x1 - x0)[..., None], O)
    return sy, ey, sx, ex


def finish(sums, sy, ey, sx, ex):
    sums = sums.transpose(0, 1, 4, 2, 3)
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(jnp.float32)
    sums = sums + 128.0 * area[..., None]
    mean = sums / jnp.maximum(area, 1.0)[..., None]
    return jnp.where(area[..., None] > 0, mean, 0.0)


def hdot(cols_f32, ybin):
    return jax.lax.dot_general(
        cols_f32, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def v_cur(frames_chw, bounds):
    return _rz.crop_resize_area_mxu(frames_chw, bounds, O)


def _wdot(xbin, pix, pet):
    b = pix.shape[0]
    return jax.lax.dot_general(
        xbin.reshape(b, K * O, W), pix,
        dimension_numbers=(((2,), (3,)), ((0,), (0,))),
        preferred_element_type=pet)


def v_f32dot(frames_chw, bounds):
    sy, ey, sx, ex = edges(bounds)
    ybin = _rz._bin_indicator(sy, ey, H, O, jnp.float32, bins_first=True)
    xbin = _rz._bin_indicator(sx, ex, W, O, jnp.int8, bins_first=True)
    pix = (frames_chw.astype(jnp.int32) - 128).astype(jnp.int8)
    cols = _wdot(xbin, pix, jnp.float32).reshape(pix.shape[0], K, O, 3, H)
    return finish(hdot(cols, ybin), sy, ey, sx, ex)


def v_i16(frames_chw, bounds):
    sy, ey, sx, ex = edges(bounds)
    ybin = _rz._bin_indicator(sy, ey, H, O, jnp.float32, bins_first=True)
    xbin = _rz._bin_indicator(sx, ex, W, O, jnp.int8, bins_first=True)
    pix = (frames_chw.astype(jnp.int32) - 128).astype(jnp.int8)
    cols = _wdot(xbin, pix, jnp.int32).astype(jnp.int16)
    cols = cols.reshape(pix.shape[0], K, O, 3, H).astype(jnp.float32)
    return finish(hdot(cols, ybin), sy, ey, sx, ex)


def v_bf16dot(frames_chw, bounds):
    sy, ey, sx, ex = edges(bounds)
    ybin = _rz._bin_indicator(sy, ey, H, O, jnp.float32, bins_first=True)
    xbin = _rz._bin_indicator(sx, ex, W, O, jnp.bfloat16, bins_first=True)
    pix = (frames_chw.astype(jnp.int32) - 128).astype(jnp.bfloat16)
    cols = _wdot(xbin, pix, jnp.float32).reshape(pix.shape[0], K, O, 3, H)
    return finish(hdot(cols, ybin), sy, ey, sx, ex)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frames_chw = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), np.uint8)))
    x0 = rng.uniform(0, W - 250, (B, K))
    y0 = rng.uniform(0, H - 250, (B, K))
    s = rng.uniform(20, 240, (B, K))
    boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), jnp.float32)
    bounds = jax.device_put(pad_crop_bounds(boxes, W, H))
    jax.block_until_ready((frames_chw, bounds))

    # Exactness check vs production on a small slice first (CPU-cheap).
    ref = np.asarray(jax.jit(v_cur)(frames_chw[:2], bounds[:2]))
    variants = {"cur": v_cur, "f32dot": v_f32dot, "i16": v_i16,
                "bf16dot": v_bf16dot}
    for name, fn in variants.items():
        if name != "cur":
            got = np.asarray(jax.jit(fn, static_argnums=())(
                frames_chw[:2], bounds[:2]))
            exact = np.array_equal(got, ref)
            print(f"{name}: bit-exact={exact} maxdiff="
                  f"{np.abs(got - ref).max():.3g}", flush=True)
    want = sys.argv[1:] or list(variants)
    for name in want:
        try:
            t = slope(variants[name], frames_chw, bounds)
            print(f"{name:8s} {t*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:8s} FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
