"""Per-op timing of the P-Net trunk + pyramid resize at the biggest 1080p
level, b128 bf16.  All inputs passed as explicit jit args (closures over
device arrays embed them as constants -> pathological re-uploads)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from truely_tpu.ops.resize import resize_area

B, H, W = 128, 649, 1153
DT = jnp.bfloat16
rng = np.random.default_rng(0)
k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 8)
w1 = jax.random.normal(ks[0], (3, 3, 3, 10), DT) * 0.1
w2 = jax.random.normal(ks[1], (3, 3, 10, 16), DT) * 0.1
w3 = jax.random.normal(ks[2], (3, 3, 16, 32), DT) * 0.1
w1p = jax.random.normal(ks[4], (4, 4, 3, 40), DT) * 0.1
w2p = jax.random.normal(ks[5], (4, 4, 10, 64), DT) * 0.1
w3p = jax.random.normal(ks[6], (2, 2, 64, 128), DT) * 0.1


def conv(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(DT)


x0 = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8), DT)
frame = jax.device_put(
    rng.integers(0, 256, (B, 1080, 1920, 3), dtype=np.uint8))
h1 = jnp.asarray(rng.normal(size=(B, H - 2, W - 2, 10)), DT)
HP, WP = (H - 2 + 1) // 2, (W - 2 + 1) // 2
hp = jnp.asarray(rng.normal(size=(B, HP, WP, 10)), DT)
h2 = jnp.asarray(rng.normal(size=(B, HP - 2, WP - 2, 16)), DT)
hc2p = jnp.asarray(rng.normal(size=(B, HP // 2 - 1, WP // 2 - 1, 64)), DT)
jax.block_until_ready((x0, frame, h1, hp, h2, hc2p))


def pool(h):
    return lax.reduce_window(h, -np.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID")


cases = [
    ("resize 1080p->649x1153 (area)",
     lambda a: resize_area(a, (H, W), precision=lax.Precision.DEFAULT,
                           dtype=DT), frame),
    ("conv1 3->10 3x3", lambda a: conv(a, w1), x0),
    ("pool 2x2 on 10ch fullres", pool, h1),
    ("conv2 10->16 3x3 (pooled res)", lambda a: conv(a, w2), hp),
    ("conv3 16->32 3x3 (pooled res)", lambda a: conv(a, w3), h2),
    ("conv1p 3->40 4x4 s2", lambda a: conv(a, w1p, 2), x0),
    ("conv2p 10->64 4x4 s2", lambda a: conv(a, w2p, 2), hp),
    ("conv3p 64->128 2x2", lambda a: conv(a, w3p, 1), hc2p),
]

for name, fn, arg in cases:
    jf = jax.jit(fn)

    def chain(n):
        t0 = time.perf_counter()
        s = jnp.float32(0)
        a = arg
        for _ in range(n):
            out = jf(a)
            s = out[(0,) * out.ndim].astype(jnp.float32)
            a = arg + s.astype(arg.dtype) * 0  # data dep: serializes steps
        float(s)
        return time.perf_counter() - t0

    chain(1); chain(1)
    per = min((chain(5) - chain(2)) / 3 for _ in range(3))
    out_t = jax.eval_shape(fn, arg)
    gb = np.prod(out_t.shape) * out_t.dtype.itemsize / 1e9
    print(f"{name}: {per*1e3:6.1f} ms  out={gb:.2f} GB", flush=True)
