"""Pallas bilinear crop-resize equivalence vs the XLA gather path
(interpret mode on CPU; the TPU-compiled path is exercised on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from truely_tpu.ops.crop_pallas import crop_resize_bilinear_pallas
from truely_tpu.ops.resize import crop_resize_bilinear

RNG = np.random.default_rng(7)


def _check(frames, bounds, out_size):
    ref = np.asarray(crop_resize_bilinear(jnp.asarray(frames),
                                          jnp.asarray(bounds), out_size))
    got = np.asarray(crop_resize_bilinear_pallas(
        jnp.asarray(frames), jnp.asarray(bounds), out_size, interpret=True))
    assert got.shape == ref.shape
    # The two paths associate the lerp differently; on 0..255 pixels the
    # f32 discrepancy is <1e-3.
    np.testing.assert_allclose(got, ref, atol=5e-3)


def _boxes(k, h, w):
    x0 = RNG.integers(0, w - 1, size=k)
    y0 = RNG.integers(0, h - 1, size=k)
    x1 = x0 + RNG.integers(1, w, size=k)
    y1 = y0 + RNG.integers(1, h, size=k)
    return np.stack([x0, y0, np.minimum(x1, w), np.minimum(y1, h)],
                    axis=-1).astype(np.int32)


def test_random_boxes_match_xla_path():
    frames = RNG.integers(0, 256, size=(2, 64, 96, 3), dtype=np.uint8)
    bounds = np.stack([_boxes(5, 64, 96) for _ in range(2)])
    _check(frames, bounds, 16)


def test_unaligned_frame_and_crop_sizes():
    # H, W not multiples of the uint8 tile; out_size not a multiple of 8.
    frames = RNG.integers(0, 256, size=(1, 37, 53, 3), dtype=np.uint8)
    bounds = np.stack([_boxes(3, 37, 53)])
    _check(frames, bounds, 13)


def test_face_crop_shape_80():
    # The production shape: 80x80 crops (reference server/model.py:57).
    frames = RNG.integers(0, 256, size=(1, 128, 128, 3), dtype=np.uint8)
    bounds = np.array([[[17, 9, 101, 93]]], dtype=np.int32)
    _check(frames, bounds, 80)


@pytest.mark.parametrize(
    "box",
    [
        [0, 0, 96, 64],   # full frame
        [10, 10, 11, 11],  # single pixel
        [0, 0, 1, 64],     # single column
        [95, 63, 96, 64],  # bottom-right corner pixel
    ],
)
def test_edge_boxes(box):
    frames = RNG.integers(0, 256, size=(1, 64, 96, 3), dtype=np.uint8)
    bounds = np.array([[box]], dtype=np.int32)
    _check(frames, bounds, 8)


def test_empty_and_inverted_boxes_give_zeros():
    frames = RNG.integers(0, 256, size=(1, 64, 96, 3), dtype=np.uint8)
    bounds = np.array(
        [[[5, 5, 5, 9], [9, 9, 5, 5], [0, 0, 0, 0]]], dtype=np.int32
    )
    got = np.asarray(crop_resize_bilinear_pallas(
        jnp.asarray(frames), jnp.asarray(bounds), 8, interpret=True))
    assert np.all(got == 0.0)


def test_width_sharded_path(monkeypatch):
    # Force the width-shard accumulation path (used for 1080p on hardware,
    # where a full-width frame block would blow the VMEM budget).
    import truely_tpu.ops.crop_pallas as cp

    monkeypatch.setattr(cp, "_SHARD_BYTES", 64 * 256 * 3)  # -> 2+ shards
    frames = RNG.integers(0, 256, size=(2, 64, 512, 3), dtype=np.uint8)
    bounds = np.stack([_boxes(4, 64, 512) for _ in range(2)])
    # include a box straddling the shard boundary at x=256
    bounds[0, 0] = [200, 5, 300, 60]
    _check(frames, bounds, 16)


def test_float_input_matches():
    frames = RNG.normal(size=(1, 40, 72, 3)).astype(np.float32) * 100
    bounds = np.array([[[3, 5, 60, 33]]], dtype=np.int32)
    ref = np.asarray(crop_resize_bilinear(jnp.asarray(frames),
                                          jnp.asarray(bounds), 8))
    got = np.asarray(crop_resize_bilinear_pallas(
        jnp.asarray(frames), jnp.asarray(bounds), 8, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)
