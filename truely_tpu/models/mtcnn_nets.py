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


def apply_pnet_trunk_folded(
    params: dict,
    x: jnp.ndarray,
    width: int,
    *,
    fold: int = 4,
    dtype: Optional[jnp.dtype] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """P-Net trunk on width-folded input (ops/fold.py): same math as
    :func:`apply_pnet_trunk`, but the W axis is packed F pixels deep into
    channels so every conv runs at MXU-shaped channel counts (12->40,
    40->64, 64->128) instead of the 1-3%-utilization 3/10/16/32-channel
    originals.  ~3x faster at 1080p b128 despite the 2.67x FLOP inflation
    of the banded folded kernels.

    ``x`` is the folded NORMALIZED level, (B, H, ceil(W/F), F*3);
    ``width`` is the true (unpadded) pixel width of the level.

    Returns ``(prob, reg)`` where prob is (B, H', S) over S = W_b * F
    slots — slot index IS the output pixel x, garbage tail slots forced to
    -1.0 — and reg is the folded conv4_2 regression grid (B, H', W_b, F*4)
    whose row for slot s is s // F with channels [ (s % F)*4 : +4 ].
    """
    from truely_tpu.ops.fold import (
        fold_conv_weights, fold_pointwise_weights, pool_pair_perm,
        tile_phase,
    )

    assert fold % 2 == 0, "phase-pair pooling needs an even fold"
    b, rows, wb, _ = x.shape

    # bf16 production paths accumulate on the MXU and emit bf16 directly
    # (halving every inter-stage HBM pass); dtype=None keeps f32 outputs so
    # the CPU exactness tests against the direct trunk stay tight.
    acc_t = jnp.float32 if dtype is None else jnp.dtype(dtype)

    def folded(name, out_perm=None):
        w, bias = fold_conv_weights(
            params[name]["w"], params[name]["b"], fold
        )
        if out_perm is not None:
            w, bias = w[..., out_perm], bias[out_perm]
        return w, bias

    def alpha(name, out_perm=None):
        a = tile_phase(params[name]["alpha"], fold)
        return a if out_perm is None else a[out_perm]

    def convp(xx, wb_, act=None, wpad=0, acc=None):
        """Folded conv with the right-block pad folded INTO the conv and
        bias+PReLU chained directly on the output so XLA fuses them into
        one pass (separate pad/prelu ops each cost a full HBM round trip
        over these frame-sized tensors)."""
        w, bias = wb_
        if dtype is not None:
            xx = xx.astype(dtype)
            w = w.astype(dtype)
        out = jax.lax.conv_general_dilated(
            xx, w, window_strides=(1, 1),
            padding=((0, 0), (0, wpad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc or acc_t,
            precision=precision,
        )
        out = out + bias.astype(out.dtype)
        if act is not None:
            # PReLU as max(x,0) + a*min(x,0): bit-identical to the
            # where-form (the a*x product only survives where x < 0) and
            # expressed in ops XLA fuses into the conv epilogue, where the
            # where-form ran as its own full HBM pass.
            out = jnp.maximum(out, 0) + act.astype(out.dtype) * jnp.minimum(
                out, 0
            )
        return out

    # conv1 (3x3 valid -> folded 3x2-block; right pad inside the conv so
    # the last output block sees a full window).  Output channels come out
    # in (i, j, c) pool-pair order (phase p = 2j + i) so the width pool
    # below is a contiguous-half maximum — no masks, no strided slices
    # (those lower to gather while-loops here), no lane-regrouping reshape.
    # The conv's right pad also rounds the output block count up to EVEN,
    # so the block-pair merge below needs no separate pad op (a full HBM
    # pass over the biggest tensor in the pipeline).
    perm1 = pool_pair_perm(10, fold)
    h = convp(
        x, folded("conv1", perm1), alpha("prelu1", perm1),
        wpad=1 + (wb % 2),
    )
    w1 = width - 2                       # valid conv1 output pixels
    half = (fold // 2) * 10

    # 2x2 ceil max-pool, height half first (it halves the tensor the width
    # ops then touch).
    r1 = rows - 2
    r2 = (r1 + 1) // 2
    h = jax.lax.reduce_window(
        h, -float("inf"), jax.lax.max,
        window_dimensions=(1, 2, 1, 1), window_strides=(1, 2, 1, 1),
        padding=((0, 0), (0, 2 * r2 - r1), (0, 0), (0, 0)),
    )
    # Width half: pooled pixel j of block bx is max(phase 2j, phase 2j+1)
    # = max of the two channel halves.  Garbage tail slots (>= w1) stay
    # un-masked: wholly-garbage pooled slots are finite and provably never
    # reach a valid conv2/conv3 output (slot s of a later stage reads only
    # slots s..s+2, all inside the previous stage's valid range) — only
    # the ceil boundary slot when w1 is odd mixes garbage into a REAL
    # slot, fixed pointwise below.
    hi = h[..., half:]
    if w1 % 2:
        # Pooled pixel (w1-1)//2 covers only conv1 pixel w1-1 (ceil): mask
        # its pair partner (phase w1, the first garbage slot — always in
        # the i=1 half) to -inf so the pair max degenerates to the single
        # valid pixel.  The mask is a trace-time constant and the where
        # fuses into the maximum — a scatter here copied the whole tensor.
        import numpy as np_

        s = w1 - 1
        bx, j = s // fold, (s % fold) // 2
        keep = np_.ones((h.shape[2], half), bool)
        keep[bx, j * 10 : (j + 1) * 10] = False
        hi = jnp.where(jnp.asarray(keep)[None, None], hi, -float("inf"))
    m = jnp.maximum(h[..., :half], hi)
    wb2 = m.shape[2] // 2
    # Block-pair merge: (.., 2 blocks, (j, c)) -> fold*10 channels in
    # pooled-pixel-major (a*2 + j, c) order — exactly phase-major again.
    pooled = m.reshape(b, r2, wb2, fold * 10)

    h = convp(pooled, folded("conv2"), alpha("prelu2"), wpad=1)
    feat = convp(h, folded("conv3"), alpha("prelu3"), wpad=1)

    # Both 1x1 heads in ONE conv so the (large) trunk activation is read
    # once.  The two-class softmax collapses to sigmoid(z1 - z0), so the
    # classifier contributes a single difference channel per phase:
    # channels [0:fold] are the fold logit differences, [fold:] the
    # fold*4 regression offsets.  The reg grid returned here is ~100x
    # smaller than returning 128-channel trunk features for a downstream
    # gather (which cost a 1.5 GB layout copy at 1080p b128), with
    # identical per-cell math.
    w41, b41 = params["conv4_1"]["w"], params["conv4_1"]["b"]
    wdiff = (w41[..., 1:2] - w41[..., 0:1], b41[1:2] - b41[0:1])
    wdf, bdf = fold_pointwise_weights(wdiff[0], wdiff[1], fold)
    wrf, brf = fold_pointwise_weights(
        params["conv4_2"]["w"], params["conv4_2"]["b"], fold
    )
    heads = convp(
        feat,
        (jnp.concatenate([wdf, wrf], axis=-1),
         jnp.concatenate([bdf, brf])),
        acc=jnp.float32,
    ).astype(jnp.float32)
    reg = heads[..., fold:]
    hp, wb3 = heads.shape[1], heads.shape[2]
    prob = jax.nn.sigmoid(heads[..., :fold])
    # Garbage slots get -1 (not 0) so zero-threshold configs still reject.
    w3 = (w1 + 1) // 2 - 4               # valid conv3 output pixels
    slot_ok = (jnp.arange(wb3 * fold).reshape(wb3, fold) < w3)[None, None]
    prob = jnp.where(slot_ok, prob, -1.0).reshape(b, hp, wb3 * fold)
    return prob, reg


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
