import jax, jax.numpy as jnp
from jax import lax
from truely_tpu.ops.resize import resize_area

B, H, W = 128, 649, 1153


def f(a):
    return resize_area(a, (H, W), precision=lax.Precision.DEFAULT,
                       dtype=jnp.bfloat16)


x = jax.ShapeDtypeStruct((B, 1080, 1920, 3), jnp.uint8)
txt = jax.jit(f).lower(x).compile().as_text()
import re
ops = {}
for line in txt.splitlines():
    m = re.search(r"= \S+ (\w+)\(", line)
    if m:
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
print(sorted(ops.items(), key=lambda kv: -kv[1])[:15])
for line in txt.splitlines():
    if ("dot(" in line or "convolution(" in line or "fusion(" in line
            or "reduce_window" in line):
        print(line.strip()[:220])
