"""Slope-timed breakdown of cascade stages 2-3 at b128 1080p with
production capacities: crops, nets, NMS, and top-k gathers, to attribute
the ~75 ms gap between detect_faces (full caps) and detect_caps1.

Run: timeout 900 python _probe_stage23.py [--batch 128]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from truely_tpu.config import DetectorConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.pipeline.mtcnn import _topk_gather, _batched_nms
from truely_tpu.models.mtcnn_nets import apply_rnet, apply_onet
from truely_tpu.ops.resize import crop_resize_area_mxu
from truely_tpu.ops.boxes import pad_crop_bounds

B = 128
H, W = 1080, 1920
cfg = DetectorConfig(frame_batch=B)
det = Detector(cfg)
dtype = jnp.dtype(cfg.compute_dtype)
rng = np.random.default_rng(0)

frames = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (B, H, W, 3), np.uint8)))

K2, K3 = cfg.mtcnn.rnet_capacity, cfg.mtcnn.onet_capacity
KS1 = cfg.mtcnn.pnet_topk_total


def rand_boxes(k):
    x0 = rng.uniform(0, W - 250, (B, k))
    y0 = rng.uniform(0, H - 250, (B, k))
    s = rng.uniform(20, 240, (B, k))
    return jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), jnp.float32)


boxes1 = jax.device_put(rand_boxes(KS1))
scores1 = jax.device_put(jnp.asarray(rng.uniform(0.6, 1, (B, KS1)), jnp.float32))
valid1 = jax.device_put(jnp.ones((B, KS1), bool))
boxes2 = jax.device_put(rand_boxes(K2))
scores2 = jax.device_put(jnp.asarray(rng.uniform(0.6, 1, (B, K2)), jnp.float32))
valid2 = jax.device_put(jnp.ones((B, K2), bool))
boxes3 = jax.device_put(rand_boxes(K3))
crops24 = jax.device_put(jnp.asarray(
    rng.normal(size=(B * K2, 24, 24, 3)), jnp.float32))
crops48 = jax.device_put(jnp.asarray(
    rng.normal(size=(B * K3, 48, 48, 3)), jnp.float32))
lvl_id = jax.device_put(jnp.asarray(
    rng.integers(0, 12, (B, KS1)), jnp.int32))


def tap(y):
    leaves = jax.tree_util.tree_leaves(y)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        flat = leaf.reshape(-1)
        acc = acc + jnp.sum(flat[:8].astype(jnp.float32))
    return acc


def slope(f, x):
    jf = jax.jit(lambda x: tap(f(x)))
    mixed = jax.jit(lambda x, s: (x + (s * 0).astype(x.dtype))
                    if x.dtype != jnp.uint8 else
                    (x ^ (s.astype(jnp.int32) % 2).astype(jnp.uint8)))

    def chain(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            s = jf(xx)
            xx = mixed(x, s)
        float(s)
        return time.perf_counter() - t0

    chain(1); chain(1)
    return min((chain(7) - chain(2)) / 5 for _ in range(3))


frames_chw = jax.jit(lambda f: jnp.transpose(f, (0, 3, 1, 2)))(frames)
jax.block_until_ready(frames_chw)

import truely_tpu.ops.resize as _rz

def crops_bf16(f, bounds, o):
    """crop_resize_area_mxu with the int8 W-pass disabled (bf16 dot with
    f32 accumulation -> no int32->f32 copy of the cols intermediate)."""
    b, c, h, w = f.shape
    k = bounds.shape[1]
    x0, y0, x1, y1 = (bounds[..., i] for i in range(4))
    sy, ey = _rz._bin_edges(y0[..., None], (y1 - y0)[..., None], o)
    sx, ex = _rz._bin_edges(x0[..., None], (x1 - x0)[..., None], o)
    ybin = _rz._bin_indicator(sy, ey, h, o, jnp.float32, bins_first=True)
    xbin = _rz._bin_indicator(sx, ex, w, o, jnp.bfloat16, bins_first=True)
    cols = jax.lax.dot_general(
        xbin.reshape(b, k * o, w), f.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(b, k, o, c, h)
    sums = jax.lax.dot_general(
        cols, ybin,
        dimension_numbers=(((4,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sums = sums.transpose(0, 1, 4, 2, 3)
    area = ((ey - sy)[..., :, None] * (ex - sx)[..., None, :]).astype(jnp.float32)
    return sums / area[..., None]


cases = [
    ("crops24 int8 K=%d" % K2, lambda f: crop_resize_area_mxu(
        f, pad_crop_bounds(boxes2, W, H), 24, dtype=dtype), frames_chw),
    ("crops48 int8 K=%d" % K3, lambda f: crop_resize_area_mxu(
        f, pad_crop_bounds(boxes3, W, H), 48, dtype=dtype), frames_chw),
    ("crops24 bf16 K=%d" % K2, lambda f: crops_bf16(
        f, pad_crop_bounds(boxes2, W, H), 24), frames_chw),
    ("crops48 bf16 K=%d" % K3, lambda f: crops_bf16(
        f, pad_crop_bounds(boxes3, W, H), 48), frames_chw),
    ("rnet b*K2", lambda c: apply_rnet(det.params.mtcnn.rnet, c, dtype=dtype),
     crops24),
    ("onet b*K3", lambda c: apply_onet(det.params.mtcnn.onet, c, dtype=dtype),
     crops48),
    ("nms stage1 grouped K=%d" % KS1, lambda s: _batched_nms(
        boxes1, s, valid1, 0.5, max_rounds=cfg.mtcnn.nms_max_rounds,
        groups=lvl_id), scores1),
    ("nms stage1 cross K=%d" % KS1, lambda s: _batched_nms(
        boxes1, s, valid1, 0.7, max_rounds=cfg.mtcnn.nms_max_rounds),
     scores1),
    ("nms stage2 K=%d" % K2, lambda s: _batched_nms(
        boxes2, s, valid2, 0.7, max_rounds=cfg.mtcnn.nms_max_rounds),
     scores2),
    ("topk_gather s1->K2", lambda s: _topk_gather(
        s, valid1, K2, boxes1), scores1),
    ("topk_gather s2->K3", lambda s: _topk_gather(
        s, valid2, K3, boxes2), scores2),
]

for name, f, arg in cases:
    try:
        t = slope(f, arg)
        print(f"{name}: {t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
