"""Banded (gather + FMA) H-pass for the pyramid resample vs the dense dot.

The level-0 H-pass (1080 -> 649) is a dot against an area matrix with <= 3
nonzeros per row (band at static offsets): ~1.03 Tflop of mostly-zero MACs,
~6 ms.  The banded form gathers rows at STATIC indices (each row is a
contiguous 11.5 KB block — not the slow element-granularity gather case)
and does a 3-tap weighted add on the VPU: bandwidth-bound ~3 ms if the
static row gather runs near HBM speed.

Also measures the full level-0 resample both ways (H banded + W dot).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.ops.resize import _area_matrix, resize_area  # noqa: E402

B, H, W = 128, 1080, 1920
OH, OW = 649, 1153
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def band_params(in_size, out_size, taps=3):
    """Static row indices (out_size,) + weights (taps, out_size)."""
    base = np.zeros(out_size, np.int32)
    wts = np.zeros((taps, out_size), np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)
        assert e - s <= taps, (i, s, e)
        base[i] = s
        wts[: e - s, i] = 1.0 / (e - s)
    return base, wts


def h_banded(x, base, wts, taps=3):
    # x: (B, H, W, C) u8; out: (B, OH, W, C) bf16
    acc = None
    for t in range(taps):
        idx = np.clip(base + t, 0, x.shape[1] - 1)
        rows = jnp.take(x, jnp.asarray(idx), axis=1).astype(DT)
        term = rows * jnp.asarray(wts[t], DT)[None, :, None, None]
        acc = term if acc is None else acc + term
    return acc


def h_dot(x):
    rh = _area_matrix(H, OH, dtype=DT)
    return jnp.einsum("oh,bhwc->bowc", rh, x.astype(DT))


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
    x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))
    jax.block_until_ready(x)
    base, wts = band_params(H, OH)

    a = np.asarray(jax.jit(h_dot)(x), np.float32)
    b = np.asarray(jax.jit(lambda v: h_banded(v, base, wts))(x), np.float32)
    print("H banded ~= dot:", np.allclose(a, b, atol=0.5),
          "max err", np.abs(a - b).max(), flush=True)

    t_dot = timeit(h_dot, x)
    t_band = timeit(lambda v: h_banded(v, base, wts), x)
    print(f"H-pass: dot {t_dot*1e3:6.1f} ms   banded {t_band*1e3:6.1f} ms",
          flush=True)

    def full_dot(v):
        return resize_area(v, (OH, OW), precision=jax.lax.Precision.DEFAULT,
                           dtype=DT)

    wbase, wwts = band_params(W, OW)
    rw = _area_matrix(W, OW, dtype=DT)

    def full_banded_h(v):
        y = h_banded(v, base, wts)  # (B, OH, W, C)
        return jnp.einsum("pw,bowc->bopc", rw, y)

    t_fd = timeit(full_dot, x)
    t_fb = timeit(full_banded_h, x)
    print(f"level0 full: dots {t_fd*1e3:6.1f} ms   "
          f"H-banded+W-dot {t_fb*1e3:6.1f} ms", flush=True)
