"""Quantized stage crops: crop-box coords snapped to a q-px grid so the
bin-indicator dots contract a q x q block-mean frame instead of the full
1080p frame — FLOPs / q^2 on the W-dot (the step's #1 and #2 device ops,
fusion.50/52 at ~16 ms each; see PERFORMANCE.md).

Exactness of the QUANTIZED semantics (adaptive-pool crop on the q-downsampled
image) is preserved end-to-end in integers:
  - block sums: bf16 0/1 x u8 pixels -> f32 (W sums <= 255q), then f32
    HIGHEST H-pass (sums <= 255q^2 < 2^24) — exact integers;
  - crop dots: hi/lo bf16 split of the block sums (s = 16*hi + lo, both
    halves exact bf16) on the bf16 MXU, or f32 HIGHEST — both exact;
  - one final division by (bin area * q^2).

Variants measured at production shapes (1080p b128, rnet K=64 O=24 +
onet K=32 O=48, downsample shared):
  full    — current crop_resize_area_mxu path (baseline)
  q4_f32  — q=4, crop dots in f32 HIGHEST
  q4_hilo — q=4, crop dots as two bf16 dots (hi/lo split)
  q8_hilo — q=8 (needs 3-way split? no: s <= 255*64 = 16320 = 128*hi+lo
            with hi <= 127, lo <= 127 — both exact bf16)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.ops.resize import (  # noqa: E402
    _bin_edges, _bin_indicator, _sum_matrix, crop_resize_area_mxu,
)

B, H, W = 128, 1080, 1920
rng = np.random.default_rng(0)


def make_bounds(k):
    x0 = rng.integers(0, W - 512, (B, k)).astype(np.int32)
    y0 = rng.integers(0, H - 512, (B, k)).astype(np.int32)
    span = rng.integers(24, 512, (B, k)).astype(np.int32)
    return jnp.asarray(np.stack([x0, y0, x0 + span, y0 + span], axis=-1))


def block_sums(frames, q):
    """(B, C, H, W) u8 -> (B, C, H/q, W/q) f32 exact integer q x q sums."""
    b, c, h, w = frames.shape
    wmat, _ = _sum_matrix(w, w // q, jnp.bfloat16)  # (W/q, W) 0/1
    hmat, _ = _sum_matrix(h, h // q, jnp.float32)
    pix = frames.astype(jnp.bfloat16)
    cols = jax.lax.dot_general(  # contract W: (B,C,H,W) x (W/q,W) -> (B,C,H,W/q)
        pix, wmat, dimension_numbers=(((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(  # contract H -> (B,C,W/q,H/q) -> transpose
        cols, hmat, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 1, 3, 2)


def quant_bounds(bounds, q):
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    return jnp.stack(
        [x0 // q, y0 // q, -(-x1 // q), -(-y1 // q)], axis=-1
    )


def crop_quant(frames, bounds, o, q, mode):
    """Quantized crop: adaptive-pool crop semantics on the q-downsampled
    frame.  Returns (B, K, O, O, C) f32 means in [0, 255]."""
    bs = block_sums(frames, q)  # (B, C, Hq, Wq) f32 integer sums
    qb = quant_bounds(bounds, q)
    hq, wq = bs.shape[2], bs.shape[3]
    x0, y0, x1, y1 = (qb[..., i] for i in range(4))
    sy, ey = _bin_edges(y0[..., None], (y1 - y0)[..., None], o)
    sx, ex = _bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    ybin = _bin_indicator(sy, ey, hq, o, jnp.float32, bins_first=True)
    if mode == "f32":
        xbin = _bin_indicator(sx, ex, wq, o, jnp.float32, bins_first=True)
        cols = jax.lax.dot_general(
            xbin, bs, dimension_numbers=(((3,), (3,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:  # hi/lo bf16 split: s = split*hi + lo, both exact bf16
        split = 16.0 if q <= 4 else 128.0
        xbin = _bin_indicator(sx, ex, wq, o, jnp.bfloat16, bins_first=True)
        hi = jnp.floor(bs / split)
        lo = bs - hi * split
        num = (((3,), (3,)), ((0,), (0,)))
        cols = split * jax.lax.dot_general(
            xbin, hi.astype(jnp.bfloat16), dimension_numbers=num,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xbin, lo.astype(jnp.bfloat16), dimension_numbers=num,
            preferred_element_type=jnp.float32,
        )
    sums = jax.lax.dot_general(
        cols, ybin, dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 1, 4, 2, 3)  # (B, K, Oy, Ox, C)
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(
        jnp.float32
    )
    mean = sums / (jnp.maximum(area, 1.0)[..., None] * (q * q))
    return jnp.where(area[..., None] > 0, mean, 0.0)


def numpy_ref(frames, bounds, o, q):
    """Independent numpy restatement of the quantized semantics."""
    f = np.asarray(frames).astype(np.float64)
    b, c, h, w = f.shape
    small = f.reshape(b, c, h // q, q, w // q, q).mean(axis=(3, 5))
    qb = np.asarray(quant_bounds(jnp.asarray(bounds), q))
    k = qb.shape[1]
    out = np.zeros((b, k, o, o, c))
    for bi in range(b):
        for ki in range(k):
            x0, y0, x1, y1 = qb[bi, ki]
            crop = small[bi, :, y0:y1, x0:x1]
            ch, cw = crop.shape[1], crop.shape[2]
            for i in range(o):
                ys, ye = (i * ch) // o, -((-(i + 1) * ch) // o)
                for j in range(o):
                    xs, xe = (j * cw) // o, -((-(j + 1) * cw) // o)
                    out[bi, ki, i, j] = crop[:, ys:ye, xs:xe].mean(axis=(1, 2))
    return out


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
    frames = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.uint8))
    rb, ob = make_bounds(64), make_bounds(32)
    jax.block_until_ready((frames, rb, ob))

    # correctness at small scale first
    sf = jnp.asarray(rng.integers(0, 256, (2, 3, 96, 128), dtype=np.uint8))
    sbn = np.stack([
        np.array([4, 8, 68, 72]), np.array([1, 3, 94, 91]),
    ])[None].repeat(2, 0).astype(np.int32)
    sb = jnp.asarray(sbn)
    for q in (4, 8):
        for mode in ("f32", "hilo"):
            got = np.asarray(jax.jit(
                lambda f, b: crop_quant(f, b, 6, q, mode))(sf, sb))
            ref = numpy_ref(sf, sb, 6, q)
            print(f"q{q}/{mode}: max err vs numpy {np.abs(got-ref).max():.2e}",
                  flush=True)

    def both_full(f, rb, ob):
        a = crop_resize_area_mxu(f, rb, 24)
        b_ = crop_resize_area_mxu(f, ob, 48)
        return a.sum() + b_.sum()

    def both_quant(f, rb, ob, q, mode):
        a = crop_quant(f, rb, 24, q, mode)
        b_ = crop_quant(f, ob, 48, q, mode)
        return a.sum() + b_.sum()

    t = timeit(lambda f: both_full(f, rb, ob), frames)
    print(f"full (rnet+onet):      {t*1e3:6.1f} ms", flush=True)
    for q, mode in [(4, "hilo"), (4, "f32"), (8, "hilo")]:
        t = timeit(lambda f: both_quant(f, rb, ob, q, mode), frames)
        print(f"q{q}/{mode} (rnet+onet): {t*1e3:6.1f} ms", flush=True)
