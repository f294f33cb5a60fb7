#!/usr/bin/env python3
"""Component-level device timing with forced execution (slope method).

block_until_ready does not synchronize non-scalar buffers on the
remote-attached runtime, so each component is timed as a CHAIN: every
iteration's input is mixed with a scalar tapped from the previous output
(a data dependency XLA cannot remove), and one scalar fetch at the end
forces the whole chain.  Per-step time is the slope between two chain
lengths, cancelling the round-trip constant.

Usage: python scripts/profile_device.py [component ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _tap(y):
    """Cheap (1,) f32 scalar derived from every leaf of y."""
    leaves = jax.tree_util.tree_leaves(y)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        flat = leaf.reshape(-1)
        k = min(flat.shape[0], 8)
        acc = acc + jnp.sum(flat[:k].astype(jnp.float32))
    return acc


def _mix(x, s):
    """Inject a data dependency on scalar s into uint8/float input x."""
    if x.dtype == jnp.uint8:
        return x ^ (s.astype(jnp.int32) % 2).astype(jnp.uint8)
    return x + (s * 0).astype(x.dtype)


def slope_time(f, x, n_lo=2, n_hi=7, trials=3):
    """Per-call seconds of jitted f via chained forced execution."""
    tap = jax.jit(_tap)
    mix = jax.jit(_mix)

    def chain(n):
        xx = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(xx)
            xx = mix(x, tap(y))
        float(tap(y))
        return time.perf_counter() - t0

    chain(1)  # compile everything
    chain(1)
    return min((chain(n_hi) - chain(n_lo)) / (n_hi - n_lo) for _ in range(trials))


def main():
    from truely_tpu.config import DetectorConfig
    from truely_tpu.models.mtcnn_nets import (
        apply_pnet_trunk, apply_pnet_trunk_folded,
    )
    from truely_tpu.ops.fold import fold_width
    from truely_tpu.models.inception_resnet_v1 import apply_inception_resnet_v1
    from truely_tpu.models.landmark68 import apply_landmark68
    from truely_tpu.ops.resize import (
        crop_resize_area, crop_resize_bilinear, integral_image, resize_area,
        resize_area_u8,
    )
    from truely_tpu.pipeline.mtcnn import PNET_FOLD
    from truely_tpu.ops.boxes import pad_crop_bounds
    from truely_tpu.pipeline.detector import Detector, _frame_step
    from truely_tpu.pipeline.mtcnn import _stage1, detect_faces
    from truely_tpu.pipeline.pyramid import pyramid_schedule

    batch, height, width = 64, 1080, 1920
    if "--batch" in sys.argv:
        i = sys.argv.index("--batch")
        batch = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    cfg = DetectorConfig(frame_batch=batch)
    det = Detector(cfg)
    dtype = jnp.dtype(cfg.compute_dtype)

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, height, width, 3), np.uint8))
    )
    boxes64 = jax.device_put(jnp.asarray(
        np.stack([
            rng.uniform(0, width - 200, batch),
            rng.uniform(0, height - 200, batch),
            rng.uniform(200, width, batch),
            rng.uniform(200, height, batch),
        ], axis=-1), jnp.float32
    ))
    crops80 = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (batch, 80, 80, 3)), jnp.float32))
    # ~total pyramid cell count per 1080p frame (12 levels, stride-2 P-Net)
    n_cells = 1_500_000
    probs_all = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (batch, n_cells)), jnp.float32))

    levels = pyramid_schedule(height, width, cfg.mtcnn.min_face_size,
                              cfg.mtcnn.scale_factor)
    print(f"pyramid levels: {[(l.height, l.width) for l in levels]}",
          file=sys.stderr)

    components = {
        "frame_step": (
            jax.jit(partial(_frame_step, det.params, cfg=cfg, compute_dtype=dtype)),
            frames,
        ),
        "detect_faces": (
            jax.jit(lambda f: detect_faces(det.params.mtcnn, f, cfg.mtcnn, dtype=dtype)),
            frames,
        ),
        "stage1": (
            jax.jit(lambda f: _stage1(det.params.mtcnn, f, cfg.mtcnn,
                                      dtype=dtype, precision=None)),
            frames,
        ),
        # Same-day A/B partner for "stage1": the direct (unfolded) trunk.
        "stage1_direct": (
            jax.jit(lambda f: _stage1(
                det.params.mtcnn, f,
                cfg.mtcnn.__class__(use_folded_pnet=False),
                dtype=dtype, precision=None)),
            frames,
        ),
        # Tap a FULL-SUM of each level INSIDE these jits.  _tap's
        # reshape(-1)[:8] forces a copy into the C-minor (8,128)-tiled
        # layout, which pads channels 3 -> 128 lanes and blows HBM (a single
        # f32 64x649x1153x3 level "copy" allocates 24.6 GB); a slice-only tap
        # would instead let XLA dead-code-eliminate most of the resize.  A
        # native-layout full reduction avoids both.
        "pyramid_resize": (
            jax.jit(lambda f: sum(
                resize_area(f, (l.height, l.width),
                            precision=jax.lax.Precision.DEFAULT)
                .astype(jnp.float32).sum()
                for l in levels
            )),
            frames,
        ),
        # The PRODUCTION stage-1 per-level work: int8-MXU pyramid resample
        # + width-folded trunk (what _stage1 runs when precision=None).
        "pnet_trunks_folded": (
            jax.jit(lambda f: sum(
                _tap(apply_pnet_trunk_folded(
                    det.params.mtcnn.pnet,
                    (fold_width(resize_area_u8(f, (l.height, l.width)),
                                PNET_FOLD).astype(jnp.float32) - 127.5)
                    * 0.0078125,
                    l.width, fold=PNET_FOLD, dtype=dtype, precision=None,
                ))
                for l in levels
            )),
            frames,
        ),
        "pyramid_resize_u8": (
            jax.jit(lambda f: sum(
                resize_area_u8(f, (l.height, l.width))
                .astype(jnp.float32).sum()
                for l in levels
            )),
            frames,
        ),
        "pnet_trunks": (
            jax.jit(lambda f: sum(
                apply_pnet_trunk(
                    det.params.mtcnn.pnet,
                    (resize_area(f, (l.height, l.width),
                                 precision=jax.lax.Precision.DEFAULT) - 127.5)
                    * 0.0078125,
                    dtype=dtype,
                )[0].astype(jnp.float32).sum()
                for l in levels
            )),
            frames,
        ),
        # Tap a scalar INSIDE the jit so the padded integral never becomes a
        # jit output (whose default layout pads C=3 to 128 lanes -> 68 GB).
        "integral_image": (
            jax.jit(lambda f: _tap(integral_image(f))), frames,
        ),
        "stage_crops24": (
            jax.jit(lambda f: _tap(crop_resize_area(
                integral_image(f),
                pad_crop_bounds(
                    jnp.broadcast_to(boxes64[:, None, :], (batch, 64, 4)),
                    width, height),
                24,
            ))),
            frames,
        ),
        "detect_caps1": (
            jax.jit(lambda f: detect_faces(
                det.params.mtcnn, f,
                cfg.mtcnn.__class__(rnet_capacity=1, onet_capacity=1),
                dtype=dtype)),
            frames,
        ),
        "topk_cells": (
            jax.jit(lambda f: jax.lax.top_k(
                (f[:, :366, :1000, 0].reshape(batch, -1)).astype(jnp.float32),
                256)[0]),
            frames,
        ),
        # The REAL stage-1 selection shape: one global top-k over every
        # pyramid cell (~1.5M cells/frame at 1080p).
        "topk_1m5": (
            jax.jit(lambda p: jax.lax.top_k(p, 256)),
            probs_all,
        ),
        "approx_topk_1m5": (
            jax.jit(lambda p: jax.lax.approx_max_k(
                p, 256, recall_target=0.99, aggregate_to_topk=True)),
            probs_all,
        ),
        "facenet_b64": (
            jax.jit(lambda c: apply_inception_resnet_v1(
                det.params.facenet, c, dtype=dtype)),
            crops80,
        ),
        "landmark_b64": (
            jax.jit(lambda c: apply_landmark68(
                det.params.landmark, c, dtype=dtype)),
            crops80,
        ),
        "crop_bilinear80": (
            jax.jit(lambda f: crop_resize_bilinear(
                f, boxes64.astype(jnp.int32)[:, None, :], 80)),
            frames,
        ),
    }

    want = sys.argv[1:] or list(components)
    for name in want:
        f, x = components[name]
        dt = slope_time(f, x)
        print(f"{name:18s} {dt * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
