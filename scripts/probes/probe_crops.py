"""Decompose crop_resize_area_mxu cost at b128 1080p K=64 O=24:
indicator builds, W-dot, convert, H-dot, measured separately.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import truely_tpu.ops.resize as _rz
from truely_tpu.ops.boxes import pad_crop_bounds

B, H, W = 128, 1080, 1920
K, O = 64, 24
rng = np.random.default_rng(0)
frames_chw = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (B, 3, H, W), np.uint8)))
x0 = rng.uniform(0, W - 250, (B, K))
y0 = rng.uniform(0, H - 250, (B, K))
s = rng.uniform(20, 240, (B, K))
boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), jnp.float32)
bounds = jax.device_put(pad_crop_bounds(boxes, W, H))

# Precomputed pieces as device inputs
bnp = np.asarray(bounds)
sy, ey = _rz._bin_edges(bounds[..., 1][..., None],
                        (bounds[..., 3] - bounds[..., 1])[..., None], O)
sx, ex = _rz._bin_edges(bounds[..., 0][..., None],
                        (bounds[..., 2] - bounds[..., 0])[..., None], O)
ybin = jax.device_put(_rz._bin_indicator(sy, ey, H, O, jnp.float32,
                                         bins_first=True))
xbin8 = jax.device_put(_rz._bin_indicator(sx, ex, W, O, jnp.int8,
                                          bins_first=True))
pix8 = jax.device_put(jax.jit(lambda f: (
    f.astype(jnp.int32) - 128).astype(jnp.int8))(frames_chw))
cols_i32 = jax.device_put(jax.jit(lambda xb, p: jax.lax.dot_general(
    xb.reshape(B, K * O, W), p,
    dimension_numbers=(((2,), (3,)), ((0,), (0,))),
    preferred_element_type=jnp.int32))(xbin8, pix8))
cols_f32 = jax.device_put(jax.jit(
    lambda c: c.reshape(B, K, O, 3, H).astype(jnp.float32))(cols_i32))
jax.block_until_ready((ybin, xbin8, pix8, cols_i32, cols_f32))


def tap(y):
    leaves = jax.tree_util.tree_leaves(y)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32))
    return acc


def slope(f, x):
    jf = jax.jit(lambda x: tap(f(x)))
    mixed = jax.jit(lambda x, s: (x + (s * 0).astype(x.dtype))
                    if x.dtype not in (jnp.uint8, jnp.int8) else
                    (x ^ (s.astype(jnp.int32) % 2).astype(x.dtype)))

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


cases = [
    ("bin_edges+indicators only", lambda b: (
        _rz._bin_indicator(*_rz._bin_edges(b[..., 1][..., None],
                                           (b[..., 3] - b[..., 1])[..., None],
                                           O), H, O, jnp.float32,
                           bins_first=True),
        _rz._bin_indicator(*_rz._bin_edges(b[..., 0][..., None],
                                           (b[..., 2] - b[..., 0])[..., None],
                                           O), W, O, jnp.int8,
                           bins_first=True)), bounds.astype(jnp.float32)),
    ("W-dot int8 (pre-built xbin)", lambda xb: jax.lax.dot_general(
        xb.reshape(B, K * O, W), pix8,
        dimension_numbers=(((2,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.int32), xbin8),
    ("convert+reshape cols", lambda c: c.reshape(B, K, O, 3, H)
     .astype(jnp.float32), cols_i32),
    ("H-dot f32 HIGHEST (pre-built)", lambda c: jax.lax.dot_general(
        c, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST), cols_f32),
    ("H-dot f32 DEFAULT (pre-built)", lambda c: jax.lax.dot_general(
        c, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32), cols_f32),
]

for name, f, arg in cases:
    try:
        t = slope(f, arg)
        print(f"{name}: {t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:150]}", flush=True)
