"""Bit-exactness of the fused Pallas stage-crop kernel (interpret mode).

The fused kernel must match the integral-image oracle
(ops.resize.crop_resize_area) EXACTLY: every intermediate in the kernel is
an exact integer in its dtype, and the final un-shift/divide is the same
f32 expression, so any mismatch is a real bug, not rounding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from truely_tpu.ops.resize import crop_resize_area, integral_image
from truely_tpu.ops.crop_area_fused import (
    crop_resize_area_fused,
    prep_frames_for_fused_crops,
)


def _random_bounds(rng, b, k, w, h, *, include_edge_cases=True):
    x0 = rng.integers(0, w, (b, k))
    y0 = rng.integers(0, h, (b, k))
    x1 = np.minimum(w, x0 + rng.integers(0, w, (b, k)))
    y1 = np.minimum(h, y0 + rng.integers(0, h, (b, k)))
    bounds = np.stack([x0, y0, x1, y1], axis=-1).astype(np.int32)
    if include_edge_cases and k >= 6:
        bounds[:, 0] = [0, 0, w, h]          # full frame
        bounds[:, 1] = [3, 5, 4, 6]          # single pixel
        bounds[:, 2] = [7, 2, 7, 9]          # empty (x0 == x1)
        bounds[:, 3] = [0, 0, 1, h]          # full-height sliver
        bounds[:, 4] = [0, 0, w, 1]          # full-width sliver
        bounds[:, 5] = [w - 2, h - 2, w, h]  # bottom-right corner
    return bounds


@pytest.mark.parametrize(
    "h,w,k,o",
    [
        (40, 56, 8, 24),    # small frame, R-Net size
        (40, 56, 8, 48),    # small frame, O-Net size (bins wider than crop)
        (72, 96, 16, 24),   # kt does not divide 384/o evenly -> kt=16
        (131, 200, 6, 24),  # non-multiple-of-128 dims exercise padding
    ],
)
def test_fused_matches_integral_oracle(h, w, k, o):
    rng = np.random.default_rng(0)
    b = 2
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    bounds = jnp.asarray(_random_bounds(rng, b, k, w, h))
    want = crop_resize_area(integral_image(jnp.asarray(frames)), bounds, o)
    frames_chw = jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
    got = crop_resize_area_fused(
        prep_frames_for_fused_crops(frames_chw), bounds, o,
        src_hw=(h, w), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_kt_tiling_is_invisible():
    """Different kernel tilings must give identical results."""
    rng = np.random.default_rng(1)
    b, h, w, k, o = 2, 64, 80, 8, 24
    frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    bounds = jnp.asarray(_random_bounds(rng, b, k, w, h))
    frames_p = prep_frames_for_fused_crops(
        jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
    )
    outs = [
        np.asarray(crop_resize_area_fused(
            frames_p, bounds, o, src_hw=(h, w), kt=kt, interpret=True,
        ))
        for kt in (1, 2, 4, 8)
    ]
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0], other)


def test_fused_max_value_pixels_exact():
    """All-255 frames stress the hi/lo split at its extreme values."""
    b, h, w, k, o = 1, 64, 128, 4, 24
    frames = np.full((b, h, w, 3), 255, dtype=np.uint8)
    bounds = jnp.asarray(
        np.array([[[0, 0, w, h], [1, 1, w - 1, h - 1],
                   [0, 0, 5, 64], [3, 7, 100, 20]]], dtype=np.int32)
    )
    want = crop_resize_area(integral_image(jnp.asarray(frames)), bounds, o)
    got = crop_resize_area_fused(
        prep_frames_for_fused_crops(
            jnp.transpose(jnp.asarray(frames), (0, 3, 1, 2))
        ),
        bounds, o, src_hw=(h, w), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.all(np.asarray(got)[0, 0] == 255.0)
