"""Timing probe: width-folded P-Net trunk (ops/fold.py, fold F=4 kept
folded through the pool) vs the direct trunk — the LIBRARY implementations
(models/mtcnn_nets.py) — on the biggest 1080p pyramid level, b128 bf16.

Differs from probe_packed.py's shelved space-to-depth variant in two ways
that matter: only the width axis folds (H stays spatial), so conv2 sees
C_in=40 and conv3 C_in=64; and the 2x2 ceil-pool runs IN the folded layout
(phase-pair max + block-pair concat), so no unfold/refold relayout touches
a frame-sized tensor.  Exactness is pinned by tests/test_fold.py.
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np
import jax
import jax.numpy as jnp

B, H, W = 128, 649, 1153
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def np_params():
    def conv(kh, kw, cin, cout):
        return {
            "w": jnp.asarray(
                rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)
            ) * 0.1,
            "b": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
        }

    def pr(c):
        return {"alpha": jnp.asarray(
            np.full((c,), 0.25, np.float32))}

    return {
        "conv1": conv(3, 3, 3, 10), "prelu1": pr(10),
        "conv2": conv(3, 3, 10, 16), "prelu2": pr(16),
        "conv3": conv(3, 3, 16, 32), "prelu3": pr(32),
        "conv4_1": conv(1, 1, 32, 2), "conv4_2": conv(1, 1, 32, 4),
    }


if __name__ == "__main__":
    from truely_tpu.models.mtcnn_nets import (
        apply_pnet_trunk, apply_pnet_trunk_folded,
    )
    from truely_tpu.ops.fold import fold_width
    from truely_tpu.pipeline.mtcnn import PNET_FOLD, _normalize

    print("devices:", jax.devices(), flush=True)
    params = np_params()
    x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    jax.block_until_ready(x)
    print("input ready", flush=True)

    def run_direct(frames):
        prob, feat = apply_pnet_trunk(
            params, _normalize(frames), dtype=DT, precision=None
        )
        return prob, feat.astype(DT)

    def run_folded(frames):
        prob, feat = apply_pnet_trunk_folded(
            params, _normalize(fold_width(frames, PNET_FOLD)), W,
            fold=PNET_FOLD, dtype=DT, precision=None,
        )
        return prob, feat

    def run_foldonly(frames):
        xf = _normalize(fold_width(frames, PNET_FOLD)).astype(DT)
        return xf.sum(axis=(1, 2, 3))[None, None], xf[:, :1, :1, :1]

    for name, fn in [("foldonly", run_foldonly),
                     ("direct", run_direct), ("folded", run_folded)]:
        jf = jax.jit(fn)
        c = jf.lower(x).compile()
        ma = c.memory_analysis()
        print(f"{name}: temp={ma.temp_size_in_bytes/1e9:.2f} GB", flush=True)

        def chain(n):
            t0 = time.perf_counter()
            xi = x
            s = jnp.float32(0)
            for _ in range(n):
                prob, _feat = jf(xi)
                s = prob[0, 0, 0]
                xi = x + s.astype(jnp.uint8) * 0
            float(s)
            return time.perf_counter() - t0

        chain(1); chain(1)
        per = min((chain(13) - chain(3)) / 10 for _ in range(3))
        print(f"{name}: {per*1e3:.1f} ms/step", flush=True)
