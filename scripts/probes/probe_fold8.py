"""Width-fold factor sweep for the P-Net trunk at the two biggest 1080p
levels, b128 bf16: F=4 (production, convs 12->40/40->64/64->128) vs F=8
(24->80/80->128/128->256 — full output lanes at (8+2)/3 = 3.33x FLOP
inflation vs F=4's 2x)."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np
import jax
import jax.numpy as jnp

from probe_folded import np_params  # noqa: E402

DT = jnp.bfloat16
B = 128


def tap(y):
    leaves = jax.tree_util.tree_leaves(y)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32))
    return acc


def slope(f, x):
    jf = jax.jit(lambda x: tap(f(x)))
    mix = jax.jit(lambda x, s: x ^ (s.astype(jnp.int32) % 2).astype(x.dtype))

    def chain(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            v = jf(xx)
            xx = mix(x, v)
        float(v)
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(7) - chain(2)) / 5 for _ in range(3))


if __name__ == "__main__":
    from truely_tpu.models.mtcnn_nets import apply_pnet_trunk_folded
    from truely_tpu.ops.fold import fold_width
    from truely_tpu.pipeline.mtcnn import _normalize

    print("devices:", jax.devices(), flush=True)
    params = np_params()
    rng = np.random.default_rng(0)

    # CPU-side quick equivalence check first (tiny shape) so a fold=8 bug
    # can't masquerade as a speedup.
    for H, W in [(649, 1153), (460, 817)]:
        x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
        jax.block_until_ready(x)
        for fold in (4, 8):
            def fn(frames, fold=fold):
                return apply_pnet_trunk_folded(
                    params, _normalize(fold_width(frames, fold)), W,
                    fold=fold, dtype=DT, precision=None,
                )
            try:
                t = slope(fn, x)
                print(f"level {H}x{W} fold={fold}: {t*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"level {H}x{W} fold={fold}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
