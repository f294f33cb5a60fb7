"""Batched 68-point facial-landmark head.

The reference ships dlib's 99 MB ERT shape predictor as a dead asset
(SURVEY.md §2.1 #16 — referenced only by its README; no code loads it).
BASELINE.json's north star replaces it with a batched TPU landmark head: a
small convnet regressing 68 (x, y) points from face crops, sharing the
pipeline's crop-resize path so landmarks come out with the embeddings in the
same jit.

Output coordinates are normalized to [0, 1] within the crop; callers map
them back through the face box.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from truely_tpu.models import layers as L

_CHANNELS = (32, 64, 128, 256)


def init_landmark68(key) -> dict:
    ks = iter(L.split_keys(key, 2 * len(_CHANNELS) + 2))
    params = {"blocks": []}
    cin = 3
    for cout in _CHANNELS:
        params["blocks"].append(
            {
                "conv_a": L.conv_params(next(ks), 3, 3, cin, cout, bias=False),
                "bn_a": L.bn_params(cout),
                "conv_b": L.conv_params(next(ks), 3, 3, cout, cout, bias=False),
                "bn_b": L.bn_params(cout),
            }
        )
        cin = cout
    params["dense_hidden"] = L.dense_params(next(ks), _CHANNELS[-1], 256)
    params["dense_out"] = L.dense_params(next(ks), 256, 136)
    return params


def synthetic_landmark_batch(rng, batch: int, size: int = 80):
    """The synthetic landmark task: random affine placements of a canonical
    68-point template drawn as bright dots on noise.

    This is the stand-in quality benchmark while no real landmark dataset
    is available offline (the reference's dlib asset is dead weight it
    never loads, SURVEY.md §2.1 #16): a model that localizes the dots has
    learned coordinate regression end to end, which is the architecture
    claim the synthetic gate pins (tests/test_landmark_quality.py).  Real
    accuracy numbers (NME on 300-W/WFLW) still require real data.

    Returns (crops (B, S, S, 3) float32 in [0,1], landmarks (B, 68, 2) in
    [0, 1] crop coordinates)."""
    import numpy as np

    template = np.stack(
        [0.5 + 0.35 * np.cos(np.linspace(0, 2 * np.pi, 68)),
         0.5 + 0.35 * np.sin(np.linspace(0, 2 * np.pi, 68))], axis=1
    )
    crops = rng.integers(0, 80, (batch, size, size, 3)).astype(np.uint8)
    lmks = np.zeros((batch, 68, 2), np.float32)
    for i in range(batch):
        scale = rng.uniform(0.6, 1.0)
        off = rng.uniform(0.0, 1.0 - scale, 2)
        pts = template * scale + off
        lmks[i] = pts
        px = np.clip((pts * size).astype(int), 0, size - 1)
        crops[i, px[:, 1], px[:, 0]] = 255
    return crops.astype(np.float32) / 255.0, lmks


def apply_landmark68(
    params: dict,
    x: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> jnp.ndarray:
    """x: (N, S, S, 3) face crops in [0, 1]. Returns (N, 68, 2) in [0, 1]."""
    kw = dict(dtype=dtype, precision=precision)
    h = x
    for blk in params["blocks"]:
        h = L.relu(L.batchnorm(L.conv2d(h, blk["conv_a"], stride=2, padding=1, **kw), blk["bn_a"]))
        h = L.relu(L.batchnorm(L.conv2d(h, blk["conv_b"], padding=1, **kw), blk["bn_b"]))
    h = jnp.mean(h, axis=(1, 2))
    h = L.relu(L.dense(h, params["dense_hidden"], **kw))
    out = L.dense(h, params["dense_out"], **kw).astype(jnp.float32)
    return jnp.reshape(jnp.asarray(out), (-1, 68, 2))
