"""P-Net / R-Net / O-Net — the MTCNN cascade stage networks.

Architectures mirror the nets reference server/model.py:47 invokes through
facenet_pytorch (so the public pretrained checkpoints convert directly via
models/weights.py), but run as pure NHWC JAX functions over whole frame
batches instead of per-frame NCHW torch modules.

Stage-net quirks preserved for checkpoint compatibility:
- per-channel PReLU activations,
- ceil-mode max-pools,
- dense layers fed in (W, H, C) flatten order (layers.flatten_mtcnn).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from truely_tpu.models import layers as L


def normalize_stage_input(x: jnp.ndarray) -> jnp.ndarray:
    """MTCNN input normalization: (x - 127.5) * 0.0078125 on raw pixels."""
    return (x.astype(jnp.float32) - 127.5) * 0.0078125


# ---------------------------------------------------------------------------
# P-Net: fully-convolutional proposal net (12x12 receptive field, stride 2)
# ---------------------------------------------------------------------------


def init_pnet(key) -> dict:
    k = L.split_keys(key, 5)
    return {
        "conv1": L.conv_params(k[0], 3, 3, 3, 10),
        "prelu1": L.prelu_params(10),
        "conv2": L.conv_params(k[1], 3, 3, 10, 16),
        "prelu2": L.prelu_params(16),
        "conv3": L.conv_params(k[2], 3, 3, 16, 32),
        "prelu3": L.prelu_params(32),
        "conv4_1": L.conv_params(k[3], 1, 1, 32, 2),
        "conv4_2": L.conv_params(k[4], 1, 1, 32, 4),
    }


def apply_pnet_trunk(
    params: dict,
    x: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared trunk + classifier head.

    Returns (prob (B, H', W'), feat (B, H', W', 32)).  The regression head
    is a 1x1 conv, so callers that only need box offsets for a few selected
    cells can gather trunk features and apply :func:`pnet_reg_from_features`
    instead of running conv4_2 over the whole grid.
    """
    kw = dict(dtype=dtype, precision=precision)
    h = L.prelu(L.conv2d(x, params["conv1"], **kw), params["prelu1"])
    h = L.max_pool(h, 2, 2, ceil_mode=True)
    h = L.prelu(L.conv2d(h, params["conv2"], **kw), params["prelu2"])
    h = L.prelu(L.conv2d(h, params["conv3"], **kw), params["prelu3"])
    cls = L.conv2d(h, params["conv4_1"], **kw).astype(jnp.float32)
    prob = jax.nn.softmax(cls, axis=-1)[..., 1]
    return prob, h


def pnet_reg_from_features(
    params: dict,
    feat: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> jnp.ndarray:
    """Apply the conv4_2 1x1 regression head to (..., 32) feature rows
    (numerically identical to running the conv over the grid)."""
    w = params["conv4_2"]["w"].reshape(32, 4)
    if dtype is not None:
        feat = feat.astype(dtype)
        w = w.astype(dtype)
    out = jnp.matmul(
        feat, w, preferred_element_type=jnp.float32, precision=precision
    ).astype(jnp.float32)
    return out + params["conv4_2"]["b"]


def apply_pnet(
    params: dict,
    x: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, H, W, 3) normalized. Returns (prob (B, H', W'), reg (B, H', W', 4))
    with H' = (H - 10) // 2 (valid convs + ceil 2x2 pool)."""
    prob, h = apply_pnet_trunk(x=x, params=params, dtype=dtype, precision=precision)
    reg = L.conv2d(h, params["conv4_2"], dtype=dtype, precision=precision).astype(jnp.float32)
    return prob, reg


# ---------------------------------------------------------------------------
# R-Net: 24x24 refinement net
# ---------------------------------------------------------------------------


def init_rnet(key) -> dict:
    k = L.split_keys(key, 6)
    return {
        "conv1": L.conv_params(k[0], 3, 3, 3, 28),
        "prelu1": L.prelu_params(28),
        "conv2": L.conv_params(k[1], 3, 3, 28, 48),
        "prelu2": L.prelu_params(48),
        "conv3": L.conv_params(k[2], 2, 2, 48, 64),
        "prelu3": L.prelu_params(64),
        "dense4": L.dense_params(k[3], 576, 128),
        "prelu4": L.prelu_params(128),
        "dense5_1": L.dense_params(k[4], 128, 2),
        "dense5_2": L.dense_params(k[5], 128, 4),
    }


def apply_rnet(
    params: dict,
    x: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (N, 24, 24, 3) normalized. Returns (prob (N,), reg (N, 4))."""
    kw = dict(dtype=dtype, precision=precision)
    h = L.prelu(L.conv2d(x, params["conv1"], **kw), params["prelu1"])
    h = L.max_pool(h, 3, 2, ceil_mode=True)
    h = L.prelu(L.conv2d(h, params["conv2"], **kw), params["prelu2"])
    h = L.max_pool(h, 3, 2, ceil_mode=True)
    h = L.prelu(L.conv2d(h, params["conv3"], **kw), params["prelu3"])
    h = L.flatten_mtcnn(h)
    h = L.prelu(L.dense(h, params["dense4"], **kw), params["prelu4"])
    cls = L.dense(h, params["dense5_1"], **kw).astype(jnp.float32)
    reg = L.dense(h, params["dense5_2"], **kw).astype(jnp.float32)
    prob = jax.nn.softmax(cls, axis=-1)[..., 1]
    return prob, reg


# ---------------------------------------------------------------------------
# O-Net: 48x48 output net (boxes + 5-point landmarks)
# ---------------------------------------------------------------------------


def init_onet(key) -> dict:
    k = L.split_keys(key, 8)
    return {
        "conv1": L.conv_params(k[0], 3, 3, 3, 32),
        "prelu1": L.prelu_params(32),
        "conv2": L.conv_params(k[1], 3, 3, 32, 64),
        "prelu2": L.prelu_params(64),
        "conv3": L.conv_params(k[2], 3, 3, 64, 64),
        "prelu3": L.prelu_params(64),
        "conv4": L.conv_params(k[3], 2, 2, 64, 128),
        "prelu4": L.prelu_params(128),
        "dense5": L.dense_params(k[4], 1152, 256),
        "prelu5": L.prelu_params(256),
        "dense6_1": L.dense_params(k[5], 256, 2),
        "dense6_2": L.dense_params(k[6], 256, 4),
        "dense6_3": L.dense_params(k[7], 256, 10),
    }


def apply_onet(
    params: dict,
    x: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: (N, 48, 48, 3) normalized. Returns (prob (N,), reg (N, 4),
    landmarks (N, 10) as [x1..x5, y1..y5] in box-relative units)."""
    kw = dict(dtype=dtype, precision=precision)
    h = L.prelu(L.conv2d(x, params["conv1"], **kw), params["prelu1"])
    h = L.max_pool(h, 3, 2, ceil_mode=True)
    h = L.prelu(L.conv2d(h, params["conv2"], **kw), params["prelu2"])
    h = L.max_pool(h, 3, 2, ceil_mode=True)
    h = L.prelu(L.conv2d(h, params["conv3"], **kw), params["prelu3"])
    h = L.max_pool(h, 2, 2, ceil_mode=True)
    h = L.prelu(L.conv2d(h, params["conv4"], **kw), params["prelu4"])
    h = L.flatten_mtcnn(h)
    h = L.prelu(L.dense(h, params["dense5"], **kw), params["prelu5"])
    cls = L.dense(h, params["dense6_1"], **kw).astype(jnp.float32)
    reg = L.dense(h, params["dense6_2"], **kw).astype(jnp.float32)
    lmk = L.dense(h, params["dense6_3"], **kw).astype(jnp.float32)
    prob = jax.nn.softmax(cls, axis=-1)[..., 1]
    return prob, reg, lmk
