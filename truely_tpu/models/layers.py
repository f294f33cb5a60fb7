"""Minimal functional layer library (NHWC, params as nested dicts).

Design notes:
- Params live in plain nested dicts (a pytree) keyed with the same submodule
  names as the upstream PyTorch checkpoints, so weight conversion
  (models/weights.py) is a mechanical walk.
- Convs run NHWC/HWIO with ``preferred_element_type=float32`` so the MXU
  accumulates in f32 even when activations/weights are cast to bf16.
- Inference-only batchnorm (folded affine); PReLU with per-channel slopes;
  max-pool with the optional ceil_mode semantics PyTorch uses in the MTCNN
  stage nets.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Padding = Union[str, int, Tuple[int, int]]


# ---------------------------------------------------------------------------
# Param constructors
# ---------------------------------------------------------------------------


def conv_params(key, kh: int, kw: int, cin: int, cout: int, bias: bool = True):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    p = {"w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def bn_params(c: int):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def prelu_params(c: int, init: float = 0.25):
    return {"alpha": jnp.full((c,), init, jnp.float32)}


def dense_params(key, cin: int, cout: int, bias: bool = True):
    std = math.sqrt(2.0 / cin)
    p = {"w": jax.random.normal(key, (cin, cout), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------


def _norm_padding(padding: Padding):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        padding = (padding, padding)
    ph, pw = padding
    return ((ph, ph), (pw, pw))


def conv2d(
    x: jnp.ndarray,
    p: dict,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Padding = "VALID",
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> jnp.ndarray:
    """NHWC conv. ``dtype`` casts inputs+weights (e.g. bf16 for the MXU);
    accumulation stays f32 via preferred_element_type."""
    if isinstance(stride, int):
        stride = (stride, stride)
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=_norm_padding(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def batchnorm(x: jnp.ndarray, p: dict, *, eps: float = 1e-3) -> jnp.ndarray:
    """Inference batchnorm in f32 (a fused scale+shift after folding)."""
    x = x.astype(jnp.float32)
    scale = p["gamma"] * lax.rsqrt(p["var"] + eps)
    return x * scale + (p["beta"] - p["mean"] * scale)


def prelu(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    alpha = p["alpha"].astype(x.dtype)
    return jnp.where(x > 0, x, alpha * x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def max_pool(
    x: jnp.ndarray,
    window: int,
    stride: int,
    *,
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """Max-pool over H, W of NHWC with PyTorch floor/ceil output sizing."""
    h, w = x.shape[1], x.shape[2]

    def pad_for(size: int) -> int:
        if ceil_mode:
            out = -(-(size - window) // stride) + 1
            # PyTorch: the last window must start inside the input.
            if (out - 1) * stride >= size:
                out -= 1
        else:
            out = (size - window) // stride + 1
        return max(0, (out - 1) * stride + window - size)

    pad_h, pad_w = pad_for(h), pad_for(w)
    # A python-scalar identity keeps this on the reduce_window_max primitive
    # (the generic variadic reduce_window has no autodiff transpose).
    neg = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def dense(
    x: jnp.ndarray,
    p: dict,
    *,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> jnp.ndarray:
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    out = jnp.matmul(x, w, preferred_element_type=jnp.float32, precision=precision)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def flatten_mtcnn(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten NHWC feature maps in the (W, H, C) order the upstream MTCNN
    dense layers expect (the NCHW ``permute(0, 3, 2, 1)`` of the original)."""
    n = x.shape[0]
    return jnp.reshape(jnp.transpose(x, (0, 2, 1, 3)), (n, -1))


def split_keys(key, n: int) -> Sequence[jax.Array]:
    return jax.random.split(key, n)
