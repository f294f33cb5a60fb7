"""Isolated timing of the biggest-level pyramid resize at b128."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from truely_tpu.ops.resize import resize_area

B, H, W = 128, 649, 1153
DT = jnp.bfloat16
rng = np.random.default_rng(0)
frame = jax.device_put(
    rng.integers(0, 256, (B, 1080, 1920, 3), dtype=np.uint8))
jax.block_until_ready(frame)
print("frame uploaded", flush=True)


def f(a):
    return resize_area(a, (H, W), precision=lax.Precision.DEFAULT, dtype=DT)


jf = jax.jit(f)
t0 = time.perf_counter()
c = jf.lower(frame).compile()
print(f"compiled in {time.perf_counter()-t0:.1f}s "
      f"temp={c.memory_analysis().temp_size_in_bytes/1e9:.2f} GB", flush=True)


def chain(n):
    t0 = time.perf_counter()
    s = jnp.float32(0)
    a = frame
    for _ in range(n):
        out = jf(a)
        s = out[0, 0, 0, 0].astype(jnp.float32)
        a = frame + s.astype(frame.dtype) * 0
    float(s)
    return time.perf_counter() - t0


print("warm1", chain(1), flush=True)
print("warm2", chain(1), flush=True)
for _ in range(3):
    print("slope", (chain(5) - chain(2)) / 3, flush=True)
