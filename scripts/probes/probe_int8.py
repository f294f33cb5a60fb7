"""int8 vs bf16 MXU rate: N chained dot+reduce steps inside ONE jit
(fori_loop), slope between two loop lengths.  One dispatch per chain."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

M, K, N = 1024, 1080, 184320
rng = np.random.default_rng(0)
a8 = jax.device_put(rng.integers(-127, 127, (M, K), dtype=np.int8))
b8 = jax.device_put(rng.integers(-127, 127, (K, N), dtype=np.int8))
abf = jax.device_put(rng.normal(size=(M, K)).astype(jnp.bfloat16))
bbf = jax.device_put(rng.normal(size=(K, N)).astype(jnp.bfloat16))
jax.block_until_ready((a8, b8, abf, bbf))


@partial(jax.jit, static_argnums=(2, 3))
def chain_dot(a, b, n, acc_dtype):
    def body(i, s):
        # optimization_barrier: XLA folds integer s*0 -> 0 and would hoist
        # the dot out of the loop; the barrier pins the data dependency.
        aa, _ = lax.optimization_barrier((a, s))
        out = lax.dot_general(aa, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=acc_dtype)
        return jnp.sum(out, dtype=acc_dtype)

    return lax.fori_loop(0, n, body, jnp.zeros((), acc_dtype))


flops = 2 * M * K * N
for name, (a, b, acc) in [("bf16", (abf, bbf, jnp.float32)),
                          ("int8", (a8, b8, jnp.int32))]:
    float(chain_dot(a, b, 3, acc))
    float(chain_dot(a, b, 24, acc))

    def t(n):
        t0 = time.perf_counter()
        float(chain_dot(a, b, n, acc))
        return time.perf_counter() - t0

    per = min((t(24) - t(3)) / 21 for _ in range(3))
    print(f"{name}: {per*1e3:.2f} ms  {flops/per/1e12:.0f} T(FL)OP/s",
          flush=True)
