"""Timing probe: phase-packed P-Net trunk (strided-conv space-to-depth
formulation) vs the current trunk, biggest 1080p pyramid level, b128 bf16.
Dummy weights — timing only."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, H, W = 128, 649, 1153
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def conv(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def prelu(x, a):
    return jnp.where(x > 0, x, a * x)


k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 12)
w1 = jax.random.normal(ks[0], (3, 3, 3, 10), DT) * 0.1
w2 = jax.random.normal(ks[1], (3, 3, 10, 16), DT) * 0.1
w3 = jax.random.normal(ks[2], (3, 3, 16, 32), DT) * 0.1
w4 = jax.random.normal(ks[3], (1, 1, 32, 6), DT) * 0.1
w1p = jax.random.normal(ks[4], (4, 4, 3, 40), DT) * 0.1
w2p = jax.random.normal(ks[5], (4, 4, 10, 64), DT) * 0.1
w3p = jax.random.normal(ks[6], (2, 2, 64, 128), DT) * 0.1
w4p = jax.random.normal(ks[7], (1, 1, 128, 24), DT) * 0.1
a1 = jax.random.normal(ks[8], (40,), jnp.float32) * 0.1


def trunk_current(x):
    h = prelu(conv(x, w1).astype(DT), 0.25)
    h = lax.reduce_window(h, -np.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                          "VALID")
    h = prelu(conv(h.astype(DT), w2).astype(DT), 0.25)
    h = prelu(conv(h, w3).astype(DT), 0.25)
    out = conv(h, w4)
    return out


def trunk_packed(x):
    h = prelu(conv(x, w1p, stride=2).astype(DT), 0.25)       # (B,R,S,40)
    # phase-major pool: max over 4 contiguous 10-channel groups
    p = jnp.maximum(jnp.maximum(h[..., 0:10], h[..., 10:20]),
                    jnp.maximum(h[..., 20:30], h[..., 30:40]))
    h = prelu(conv(p, w2p, stride=2).astype(DT), 0.25)       # (B,U,V,64)
    h = prelu(conv(h, w3p, stride=1).astype(DT), 0.25)       # (B,U',V',128)
    out = conv(h, w4p)                                        # (B,U',V',24)
    return out


x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8), DT)
jax.block_until_ready(x)

for name, fn in [("current", trunk_current), ("packed", trunk_packed)]:
    jf = jax.jit(fn)
    c = jf.lower(x).compile()
    ma = c.memory_analysis()
    print(f"{name}: temp={ma.temp_size_in_bytes/1e9:.2f} GB")

    def chain(n):
        t0 = time.perf_counter()
        xi = x
        s = jnp.float32(0)
        for _ in range(n):
            out = jf(xi)
            s = out[0, 0, 0, 0]
            xi = x + s.astype(DT) * 0
        float(s)
        return time.perf_counter() - t0

    chain(1); chain(1)
    per = min((chain(5) - chain(2)) / 3 for _ in range(3))
    print(f"{name}: {per*1e3:.1f} ms/step")
