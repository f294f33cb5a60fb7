"""A/B the recursive inner top-k of exact_topk_lastdim vs the flat inner
lax.top_k at the production stage-1 shape (B=128, N~4.19M cells, k=256).

The step trace showed sort.9 (chunk maxima, (128, 32768)) at 2.4 ms and
sort.8 (gathered survivors) at 1.2 ms; recursion shrinks both sorts to
<= 2048 columns.  This probe isolates the selection op so shared-service
variance on the full step doesn't drown a ~3 ms effect.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from truely_tpu.ops import topk  # noqa: E402

B, N, K = 128, 2**22 + 131, 256
rng = np.random.default_rng(0)


def flat_variant(p, k, chunk=128):
    """exact_topk_lastdim with plain lax.top_k inner calls (pre-change)."""
    b, n = p.shape
    nc = n // chunk
    pad = nc * chunk
    pc = p[:, :pad].reshape(b, nc, chunk)
    cmax = pc.max(axis=2)
    _, cid = jax.lax.top_k(cmax, k)
    cid = jnp.sort(cid, axis=1)
    rows = jnp.take_along_axis(pc, cid[:, :, None], axis=1)
    flat = rows.reshape(b, k * chunk)
    base = (
        cid[:, :, None] * chunk
        + jnp.arange(chunk, dtype=jnp.int32)[None, None, :]
    )
    idx_map = base.reshape(b, k * chunk)
    if pad < n:
        flat = jnp.concatenate([flat, p[:, pad:]], axis=1)
        idx_map = jnp.concatenate(
            [idx_map,
             jnp.broadcast_to(jnp.arange(pad, n, dtype=jnp.int32),
                              (b, n - pad))], axis=1)
    vals, i2 = jax.lax.top_k(flat, k)
    return vals, jnp.take_along_axis(idx_map, i2, axis=1)


def timeit(fn, x):
    jf = jax.jit(fn)

    def chain(n):
        t0 = time.perf_counter()
        xi = x
        for _ in range(n):
            v, i = jf(xi)
            xi = x + (v[0, 0] % 2)
        float(v[0, 0])
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(6) - chain(2)) / 4 for _ in range(3))


if __name__ == "__main__":
    x = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
    jax.block_until_ready(x)

    a = jax.jit(lambda v: flat_variant(v, K))(x)
    b = jax.jit(lambda v: topk.exact_topk_lastdim(v, K))(x)
    same = all(np.array_equal(np.asarray(p), np.asarray(q)) for p, q in zip(a, b))
    print("recursive == flat:", same, flush=True)

    t_flat = timeit(lambda v: flat_variant(v, K), x)
    t_rec = timeit(lambda v: topk.exact_topk_lastdim(v, K), x)
    print(f"flat inner sorts {t_flat*1e3:6.2f} ms   "
          f"recursive {t_rec*1e3:6.2f} ms", flush=True)
