"""Bit-exactness of the v2 fused Pallas stage-crop kernel vs the XLA
bin-indicator path (itself pinned bit-exact vs the integral-image oracle
in test_resize.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from truely_tpu.ops.boxes import pad_crop_bounds
from truely_tpu.ops.crop_fused2 import (
    crop_resize_area_fused2, prep_frames_fused2,
)
from truely_tpu.ops.resize import crop_resize_area_mxu


@pytest.mark.parametrize("hw,k,o", [
    ((360, 640), 8, 24),
    ((360, 640), 4, 48),
    ((1080, 1920), 8, 24),
    ((231, 411), 8, 24),   # odd dims: exercises the zero padding
])
def test_fused2_bit_exact_interpret(hw, k, o):
    h, w = hw
    rng = np.random.default_rng(7)
    b = 2
    frames = rng.integers(0, 256, (b, 3, h, w), np.uint8)
    x0 = rng.uniform(0, w - 40, (b, k))
    y0 = rng.uniform(0, h - 40, (b, k))
    s = rng.uniform(3, min(h, w) - 1, (b, k))
    boxes = np.stack([x0, y0, x0 + s, y0 + s], -1).astype(np.float32)
    bounds = pad_crop_bounds(jnp.asarray(boxes), w, h)

    ref = np.asarray(crop_resize_area_mxu(jnp.asarray(frames), bounds, o))
    got = np.asarray(crop_resize_area_fused2(
        prep_frames_fused2(jnp.asarray(frames)), bounds, o,
        src_hw=(h, w), interpret=True,
    ))
    np.testing.assert_array_equal(got, ref)


def test_fused2_empty_and_degenerate_crops():
    h, w = 120, 168
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (1, 3, h, w), np.uint8)
    boxes = jnp.asarray(np.array([[
        [10.0, 10.0, 10.0, 50.0],   # zero width
        [5.0, 5.0, 6.0, 6.0],       # 1x1
        [0.0, 0.0, 168.0, 120.0],   # full frame
        [160.0, 110.0, 168.0, 120.0],  # corner
    ]], np.float32))
    bounds = pad_crop_bounds(boxes, w, h)
    ref = np.asarray(crop_resize_area_mxu(jnp.asarray(frames), bounds, 24))
    got = np.asarray(crop_resize_area_fused2(
        prep_frames_fused2(jnp.asarray(frames)), bounds, 24,
        src_hw=(h, w), interpret=True,
    ))
    np.testing.assert_array_equal(got, ref)
