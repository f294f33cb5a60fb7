"""Inception-ResNet-v1 (FaceNet embedder), pure-function NHWC JAX.

The reference embeds every face crop with facenet_pytorch's
``InceptionResnetV1(pretrained='vggface2')`` one crop at a time on CPU
(server/model.py:19,59).  This version is the same architecture — so the
public vggface2/casia checkpoints convert via models/weights.py — but built
batched, NHWC, bf16-on-MXU, with the stem/blocks expressed so XLA fuses
bn+relu into the convs.  Param-dict keys match the upstream module names.

Works on any static input size >= ~64 (global average pooling before the
embedding head); the reference feeds 80x80 crops (not the canonical 160).
Output: 512-d L2-normalized embeddings.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from truely_tpu.models import layers as L

BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _init_basic_conv(key, kh, kw, cin, cout):
    return {
        "conv": L.conv_params(key, kh, kw, cin, cout, bias=False),
        "bn": L.bn_params(cout),
    }


def _basic_conv(x, p, *, stride=1, padding="VALID", dtype=None, precision=None):
    h = L.conv2d(x, p["conv"], stride=stride, padding=padding, dtype=dtype, precision=precision)
    return L.relu(L.batchnorm(h, p["bn"], eps=BN_EPS))


def _init_block35(key):
    k = L.split_keys(key, 7)
    return {
        "branch0": _init_basic_conv(k[0], 1, 1, 256, 32),
        "branch1": [
            _init_basic_conv(k[1], 1, 1, 256, 32),
            _init_basic_conv(k[2], 3, 3, 32, 32),
        ],
        "branch2": [
            _init_basic_conv(k[3], 1, 1, 256, 32),
            _init_basic_conv(k[4], 3, 3, 32, 32),
            _init_basic_conv(k[5], 3, 3, 32, 32),
        ],
        "conv2d": L.conv_params(k[6], 1, 1, 96, 256, bias=True),
    }


def _block35(x, p, scale, *, dtype=None, precision=None):
    kw = dict(dtype=dtype, precision=precision)
    b0 = _basic_conv(x, p["branch0"], **kw)
    b1 = _basic_conv(x, p["branch1"][0], **kw)
    b1 = _basic_conv(b1, p["branch1"][1], padding=1, **kw)
    b2 = _basic_conv(x, p["branch2"][0], **kw)
    b2 = _basic_conv(b2, p["branch2"][1], padding=1, **kw)
    b2 = _basic_conv(b2, p["branch2"][2], padding=1, **kw)
    mixed = jnp.concatenate([b0, b1, b2], axis=-1)
    up = L.conv2d(mixed, p["conv2d"], **kw).astype(jnp.float32)
    return L.relu(x.astype(jnp.float32) + up * scale)


def _init_block17(key):
    k = L.split_keys(key, 5)
    return {
        "branch0": _init_basic_conv(k[0], 1, 1, 896, 128),
        "branch1": [
            _init_basic_conv(k[1], 1, 1, 896, 128),
            _init_basic_conv(k[2], 1, 7, 128, 128),
            _init_basic_conv(k[3], 7, 1, 128, 128),
        ],
        "conv2d": L.conv_params(k[4], 1, 1, 256, 896, bias=True),
    }


def _block17(x, p, scale, *, dtype=None, precision=None):
    kw = dict(dtype=dtype, precision=precision)
    b0 = _basic_conv(x, p["branch0"], **kw)
    b1 = _basic_conv(x, p["branch1"][0], **kw)
    b1 = _basic_conv(b1, p["branch1"][1], padding=(0, 3), **kw)
    b1 = _basic_conv(b1, p["branch1"][2], padding=(3, 0), **kw)
    mixed = jnp.concatenate([b0, b1], axis=-1)
    up = L.conv2d(mixed, p["conv2d"], **kw).astype(jnp.float32)
    return L.relu(x.astype(jnp.float32) + up * scale)


def _init_block8(key):
    k = L.split_keys(key, 5)
    return {
        "branch0": _init_basic_conv(k[0], 1, 1, 1792, 192),
        "branch1": [
            _init_basic_conv(k[1], 1, 1, 1792, 192),
            _init_basic_conv(k[2], 1, 3, 192, 192),
            _init_basic_conv(k[3], 3, 1, 192, 192),
        ],
        "conv2d": L.conv_params(k[4], 1, 1, 384, 1792, bias=True),
    }


def _block8(x, p, scale, *, no_relu=False, dtype=None, precision=None):
    kw = dict(dtype=dtype, precision=precision)
    b0 = _basic_conv(x, p["branch0"], **kw)
    b1 = _basic_conv(x, p["branch1"][0], **kw)
    b1 = _basic_conv(b1, p["branch1"][1], padding=(0, 1), **kw)
    b1 = _basic_conv(b1, p["branch1"][2], padding=(1, 0), **kw)
    mixed = jnp.concatenate([b0, b1], axis=-1)
    up = L.conv2d(mixed, p["conv2d"], **kw).astype(jnp.float32)
    out = x.astype(jnp.float32) + up * scale
    return out if no_relu else L.relu(out)


def _init_mixed_6a(key):
    k = L.split_keys(key, 4)
    return {
        "branch0": _init_basic_conv(k[0], 3, 3, 256, 384),
        "branch1": [
            _init_basic_conv(k[1], 1, 1, 256, 192),
            _init_basic_conv(k[2], 3, 3, 192, 192),
            _init_basic_conv(k[3], 3, 3, 192, 256),
        ],
    }


def _mixed_6a(x, p, *, dtype=None, precision=None):
    kw = dict(dtype=dtype, precision=precision)
    b0 = _basic_conv(x, p["branch0"], stride=2, **kw)
    b1 = _basic_conv(x, p["branch1"][0], **kw)
    b1 = _basic_conv(b1, p["branch1"][1], padding=1, **kw)
    b1 = _basic_conv(b1, p["branch1"][2], stride=2, **kw)
    b2 = L.max_pool(x, 3, 2)
    return jnp.concatenate([b0, b1, b2.astype(b0.dtype)], axis=-1)


def _init_mixed_7a(key):
    k = L.split_keys(key, 7)
    return {
        "branch0": [
            _init_basic_conv(k[0], 1, 1, 896, 256),
            _init_basic_conv(k[1], 3, 3, 256, 384),
        ],
        "branch1": [
            _init_basic_conv(k[2], 1, 1, 896, 256),
            _init_basic_conv(k[3], 3, 3, 256, 256),
        ],
        "branch2": [
            _init_basic_conv(k[4], 1, 1, 896, 256),
            _init_basic_conv(k[5], 3, 3, 256, 256),
            _init_basic_conv(k[6], 3, 3, 256, 256),
        ],
    }


def _mixed_7a(x, p, *, dtype=None, precision=None):
    kw = dict(dtype=dtype, precision=precision)
    b0 = _basic_conv(x, p["branch0"][0], **kw)
    b0 = _basic_conv(b0, p["branch0"][1], stride=2, **kw)
    b1 = _basic_conv(x, p["branch1"][0], **kw)
    b1 = _basic_conv(b1, p["branch1"][1], stride=2, **kw)
    b2 = _basic_conv(x, p["branch2"][0], **kw)
    b2 = _basic_conv(b2, p["branch2"][1], padding=1, **kw)
    b2 = _basic_conv(b2, p["branch2"][2], stride=2, **kw)
    b3 = L.max_pool(x, 3, 2)
    return jnp.concatenate([b0, b1, b2, b3.astype(b0.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------


def init_inception_resnet_v1(key) -> dict:
    k = iter(L.split_keys(key, 64))
    return {
        "conv2d_1a": _init_basic_conv(next(k), 3, 3, 3, 32),
        "conv2d_2a": _init_basic_conv(next(k), 3, 3, 32, 32),
        "conv2d_2b": _init_basic_conv(next(k), 3, 3, 32, 64),
        "conv2d_3b": _init_basic_conv(next(k), 1, 1, 64, 80),
        "conv2d_4a": _init_basic_conv(next(k), 3, 3, 80, 192),
        "conv2d_4b": _init_basic_conv(next(k), 3, 3, 192, 256),
        "repeat_1": [_init_block35(next(k)) for _ in range(5)],
        "mixed_6a": _init_mixed_6a(next(k)),
        "repeat_2": [_init_block17(next(k)) for _ in range(10)],
        "mixed_7a": _init_mixed_7a(next(k)),
        "repeat_3": [_init_block8(next(k)) for _ in range(5)],
        "block8": _init_block8(next(k)),
        "last_linear": L.dense_params(next(k), 1792, 512, bias=False),
        "last_bn": L.bn_params(512),
    }


def apply_inception_resnet_v1(
    params: dict,
    x: jnp.ndarray,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
    normalize: bool = True,
) -> jnp.ndarray:
    """x: (N, H, W, 3) float input (the reference feeds crops scaled to
    [0, 1] — torchvision to_tensor — with NO fixed standardization,
    server/model.py:58).  Returns (N, 512) embeddings."""
    kw = dict(dtype=dtype, precision=precision)
    h = _basic_conv(x, params["conv2d_1a"], stride=2, **kw)
    h = _basic_conv(h, params["conv2d_2a"], **kw)
    h = _basic_conv(h, params["conv2d_2b"], padding=1, **kw)
    h = L.max_pool(h, 3, 2)
    h = _basic_conv(h, params["conv2d_3b"], **kw)
    h = _basic_conv(h, params["conv2d_4a"], **kw)
    h = _basic_conv(h, params["conv2d_4b"], stride=2, **kw)
    for p in params["repeat_1"]:
        h = _block35(h, p, 0.17, **kw)
    h = _mixed_6a(h, params["mixed_6a"], **kw)
    for p in params["repeat_2"]:
        h = _block17(h, p, 0.10, **kw)
    h = _mixed_7a(h, params["mixed_7a"], **kw)
    for p in params["repeat_3"]:
        h = _block8(h, p, 0.20, **kw)
    h = _block8(h, params["block8"], 1.0, no_relu=True, **kw)
    h = jnp.mean(h, axis=(1, 2))  # adaptive avg pool to 1x1
    h = L.dense(h, params["last_linear"], **kw)
    # BatchNorm1d on the 512-d embedding.
    h = L.batchnorm(h[:, None, None, :], params["last_bn"], eps=BN_EPS)[:, 0, 0, :]
    return L.l2_normalize(h) if normalize else h
