"""Resize-kernel parity vs torch (area mode) and cv2 (bilinear) oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch
import torch.nn.functional as TF
import cv2

from truely_tpu.ops.resize import (
    resize_area,
    resize_bilinear,
    integral_image,
    crop_resize_area,
    crop_resize_bilinear,
)


@pytest.mark.parametrize("hw,ohw", [
    ((360, 640), (216, 384)),   # pyramid scale 0 at m=0.6
    ((360, 640), (13, 22)),     # deepest pyramid level
    ((101, 57), (72, 41)),      # awkward ratios
    ((48, 48), (24, 24)),       # exact 2x
])
def test_resize_area_matches_torch(hw, ohw):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, *hw, 3), dtype=np.uint8)
    got = np.asarray(resize_area(jnp.asarray(x), ohw))
    xt = torch.from_numpy(x.astype(np.float32)).permute(0, 3, 1, 2)
    expect = TF.interpolate(xt, size=ohw, mode="area").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_crop_resize_area_matches_torch_adaptive_pool():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 90, 120, 3), dtype=np.uint8)
    bounds = np.array(
        [
            [[5, 10, 53, 70], [0, 0, 120, 90], [7, 7, 8, 8]],
            [[100, 80, 120, 90], [3, 3, 3, 3], [0, 0, 24, 24]],
        ],
        dtype=np.int32,
    )  # (B=2, K=3, 4) x0,y0,x1,y1 ; includes a 1x1 crop and an empty crop
    out = np.asarray(
        crop_resize_area(integral_image(jnp.asarray(frames)), jnp.asarray(bounds), 24)
    )
    for b in range(2):
        for k in range(3):
            x0, y0, x1, y1 = bounds[b, k]
            if x1 <= x0 or y1 <= y0:
                assert np.all(out[b, k] == 0)
                continue
            crop = frames[b, y0:y1, x0:x1].astype(np.float32)
            t = torch.from_numpy(crop).permute(2, 0, 1)[None]
            expect = TF.adaptive_avg_pool2d(t, 24)[0].permute(1, 2, 0).numpy()
            np.testing.assert_allclose(out[b, k], expect, atol=1e-3)


def test_crop_resize_bilinear_matches_cv2():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(1, 130, 200, 3), dtype=np.uint8)
    bounds = np.array([[[10, 20, 90, 110], [0, 0, 200, 130]]], dtype=np.int32)
    out = np.asarray(crop_resize_bilinear(jnp.asarray(frames), jnp.asarray(bounds), 80))
    for k in range(2):
        x0, y0, x1, y1 = bounds[0, k]
        expect = cv2.resize(
            frames[0, y0:y1, x0:x1], (80, 80), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        # cv2 runs fixed-point bilinear; allow ~1 grey-level.
        np.testing.assert_allclose(out[0, k], expect, atol=1.0)


def test_crop_resize_bilinear_upsample():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    bounds = np.array([[[10, 10, 30, 30]]], dtype=np.int32)  # 20x20 -> 80x80 upsample
    out = np.asarray(crop_resize_bilinear(jnp.asarray(frames), jnp.asarray(bounds), 80))
    expect = cv2.resize(
        frames[0, 10:30, 10:30], (80, 80), interpolation=cv2.INTER_LINEAR
    ).astype(np.float32)
    np.testing.assert_allclose(out[0, 0], expect, atol=1.0)


def test_resize_bilinear_matches_cv2():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, size=(1, 100, 160, 3), dtype=np.uint8)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (50, 80)))[0]
    expect = cv2.resize(x[0], (80, 50), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    np.testing.assert_allclose(got, expect, atol=1.0)


def test_integral_image_exact():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, size=(1, 33, 47, 3), dtype=np.uint8)
    integ = np.asarray(integral_image(jnp.asarray(x)))
    assert integ.dtype == np.int32
    assert integ[0, -1, -1, 0] == x[0, :, :, 0].sum()
    assert integ[0, 0].sum() == 0 and integ[0, :, 0].sum() == 0
    # random rectangle
    s = integ[0, 20, 30, 1] - integ[0, 5, 30, 1] - integ[0, 20, 8, 1] + integ[0, 5, 8, 1]
    assert s == x[0, 5:20, 8:30, 1].sum()


def test_crop_resize_area_mxu_bit_exact_with_integral():
    """The MXU bin-indicator formulation (int8 first pass on uint8 frames,
    shifted pixels, exact int32 bin sums) must be BIT-EXACT with the
    integral-image formulation on uint8 frames, for both 24 and 48 px
    stage-crop sizes, including degenerate and full-frame boxes."""
    from truely_tpu.ops.resize import crop_resize_area_mxu

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(2, 90, 120, 3), dtype=np.uint8)
    bounds = np.array(
        [
            [[5, 10, 53, 70], [0, 0, 120, 90], [7, 7, 8, 8]],
            [[100, 80, 120, 90], [3, 3, 3, 3], [0, 0, 24, 24]],
        ],
        dtype=np.int32,
    )
    integ = integral_image(jnp.asarray(frames))
    for o in (24, 48):
        ref = np.asarray(crop_resize_area(integ, jnp.asarray(bounds), o))
        got = np.asarray(
            crop_resize_area_mxu(jnp.asarray(frames), jnp.asarray(bounds), o)
        )
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("hw,ohw", [
    ((360, 640), (216, 384)),
    ((101, 57), (72, 41)),
    ((649, 115), (460, 82)),   # odd sizes, 1080p-bucket-like ratios
])
def test_resize_area_u8_exact_integer_means(hw, ohw):
    """The int8-MXU pyramid resample must produce, for every output pixel,
    the exact bin mean rounded once to bf16 (the f32 two-pass rounds every
    intermediate instead, so compare against an exact numpy integer-sum
    oracle, not resize_area)."""
    from truely_tpu.ops.resize import resize_area_u8

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, size=(2, *hw, 3), dtype=np.uint8)
    got = np.asarray(resize_area_u8(jnp.asarray(x), ohw)).astype(np.float32)

    h, w = hw
    oh, ow = ohw
    expect = np.zeros((2, oh, ow, 3), np.float32)
    for i in range(oh):
        ys = (i * h) // oh
        ye = -((-(i + 1) * h) // oh)
        for j in range(ow):
            xs = (j * w) // ow
            xe = -((-(j + 1) * w) // ow)
            bin_sum = x[:, ys:ye, xs:xe].astype(np.int64).sum(axis=(1, 2))
            # f32 division to match the kernel's single f32 divide exactly
            expect[:, i, j] = bin_sum.astype(np.float32) / np.float32(
                (ye - ys) * (xe - xs))
    expect_bf16 = jnp.asarray(expect).astype(jnp.bfloat16)
    np.testing.assert_array_equal(got, np.asarray(expect_bf16).astype(np.float32))


def test_pyramid_cascade_drift():
    """The production cascaded pyramid (each level resampled from the
    previous, bf16) is a DIFFERENT operator from the one-shot area
    resample (levels past the first average slightly different source
    sets), so on natural-statistics content its drift must stay small and
    bounded; white noise is excluded deliberately (averaging different
    pixel subsets of noise drifts O(sigma/sqrt(n)) by construction).
    Decision-level stability on real video is gated separately (the
    bundled-clip run); parity paths always take the exact resample."""
    from truely_tpu.ops.resize import resize_area
    from truely_tpu.pipeline.pyramid import pyramid_schedule

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(360, 640, 3)).astype(np.float32)
    smooth = cv2.GaussianBlur(noise, (0, 0), sigmaX=4.0)
    frames = np.clip(smooth, 0, 255).astype(np.uint8)[None]
    levels = pyramid_schedule(360, 640, 20, 0.709)
    assert len(levels) >= 8

    src = jnp.asarray(frames)
    for i, lvl in enumerate(levels):
        casc = resize_area(
            src, (lvl.height, lvl.width),
            precision=jax.lax.Precision.DEFAULT, dtype=jnp.bfloat16,
        )
        exact = resize_area(
            jnp.asarray(frames), (lvl.height, lvl.width),
            precision=jax.lax.Precision.HIGHEST,
        )
        diff = np.abs(
            np.asarray(casc, np.float32) - np.asarray(exact, np.float32)
        )
        assert diff.max() <= 12.0, (i, diff.max())
        assert diff.mean() <= 2.5, (i, diff.mean())
        src = casc


# ---------------------------------------------------------------------------
# Quantized stage crops (production fidelity/speed trade; MTCNNConfig
# stage_crop_quant — see PERFORMANCE.md)
# ---------------------------------------------------------------------------


def _quant_crop_numpy(frames_chw_u8, bounds, o, q):
    """Independent restatement of the quantized semantics: adaptive-pool
    crop on the q x q block-MEAN image, boxes snapped floor/ceil to the
    grid, empty boxes staying empty."""
    f = frames_chw_u8.astype(np.float64)
    b, c, h, w = f.shape
    small = f.reshape(b, c, h // q, q, w // q, q).mean(axis=(3, 5))
    k = bounds.shape[1]
    out = np.zeros((b, k, o, o, c))
    for bi in range(b):
        for ki in range(k):
            x0, y0, x1, y1 = bounds[bi, ki]
            if x1 <= x0 or y1 <= y0:
                continue
            qx0, qy0 = x0 // q, y0 // q
            qx1, qy1 = -(-x1 // q), -(-y1 // q)
            crop = small[bi, :, qy0:qy1, qx0:qx1]
            ch, cw = crop.shape[1], crop.shape[2]
            for i in range(o):
                ys, ye = (i * ch) // o, -((-(i + 1) * ch) // o)
                for j in range(o):
                    xs, xe = (j * cw) // o, -((-(j + 1) * cw) // o)
                    if ye > ys and xe > xs:
                        out[bi, ki, i, j] = crop[:, ys:ye, xs:xe].mean(
                            axis=(1, 2))
    return out


@pytest.mark.parametrize("q", [4, 8])
def test_crop_quant_matches_numpy_restatement(q):
    from truely_tpu.ops.resize import crop_resize_area_mxu_quant

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(2, 3, 96, 128), dtype=np.uint8)
    bounds = np.array([
        [[4, 8, 68, 72], [1, 3, 94, 91], [0, 0, 128, 96], [37, 41, 43, 47]],
        [[10, 10, 11, 11], [0, 0, 0, 0], [5, 5, 5, 9], [120, 88, 128, 96]],
    ], dtype=np.int32)
    got = np.asarray(
        crop_resize_area_mxu_quant(jnp.asarray(frames), jnp.asarray(bounds),
                                   6, quant=q)
    )
    ref = _quant_crop_numpy(frames, bounds, 6, q)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_crop_quant_empty_boxes_stay_empty():
    from truely_tpu.ops.resize import crop_resize_area_mxu_quant

    rng = np.random.default_rng(5)
    frames = rng.integers(1, 256, size=(1, 3, 32, 32), dtype=np.uint8)
    # x0 == x1 == 5 would quantize to a NON-empty [1, 2) superpixel box if
    # emptiness weren't preserved explicitly.
    bounds = np.array([[[5, 5, 5, 20], [7, 3, 7, 3], [3, 9, 3, 9]]], np.int32)
    got = np.asarray(
        crop_resize_area_mxu_quant(jnp.asarray(frames), jnp.asarray(bounds),
                                   4, quant=4)
    )
    assert (got == 0).all()


def test_crop_quant_falls_back_exact_on_non_divisible_frames():
    from truely_tpu.ops.resize import (
        crop_resize_area_mxu, crop_resize_area_mxu_quant,
    )

    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, size=(1, 3, 50, 66), dtype=np.uint8)
    bounds = np.array([[[3, 5, 40, 47]]], np.int32)
    got = np.asarray(crop_resize_area_mxu_quant(
        jnp.asarray(frames), jnp.asarray(bounds), 8, quant=4))
    exact = np.asarray(crop_resize_area_mxu(
        jnp.asarray(frames), jnp.asarray(bounds), 8))
    np.testing.assert_array_equal(got, exact)


def test_crop_quant_nhwc_entry_matches_nchw():
    from truely_tpu.ops.resize import crop_resize_area_mxu_quant

    rng = np.random.default_rng(7)
    nchw_f = rng.integers(0, 256, size=(1, 3, 64, 64), dtype=np.uint8)
    nhwc_f = nchw_f.transpose(0, 2, 3, 1)
    bounds = np.array([[[4, 4, 52, 56]]], np.int32)
    a = np.asarray(crop_resize_area_mxu_quant(
        jnp.asarray(nchw_f), jnp.asarray(bounds), 6, quant=4))
    b = np.asarray(crop_resize_area_mxu_quant(
        jnp.asarray(nhwc_f), jnp.asarray(bounds), 6, quant=4))
    np.testing.assert_array_equal(a, b)


def test_crop_quant_drift_on_natural_content():
    """On natural-statistics content the quantized crop must stay close to
    the exact full-resolution crop: box edges move <= q-1 px and bins
    average q x q superpixels, both small against smooth structure.  (White
    noise is excluded for the same reason as the pyramid drift test.)"""
    from truely_tpu.ops.resize import (
        crop_resize_area_mxu, crop_resize_area_mxu_quant,
    )

    rng = np.random.default_rng(8)
    noise = rng.integers(0, 256, size=(144, 192, 3)).astype(np.float32)
    smooth = cv2.GaussianBlur(noise, (0, 0), sigmaX=4.0)
    frames = np.clip(smooth, 0, 255).astype(np.uint8)[None].transpose(
        0, 3, 1, 2)
    bounds = np.array([[[12, 9, 100, 97], [40, 30, 180, 140]]], np.int32)
    exact = np.asarray(crop_resize_area_mxu(
        jnp.asarray(frames), jnp.asarray(bounds), 24))
    quant = np.asarray(crop_resize_area_mxu_quant(
        jnp.asarray(frames), jnp.asarray(bounds), 24, quant=4))
    diff = np.abs(exact - quant)
    assert diff.mean() <= 3.0, diff.mean()
    assert diff.max() <= 30.0, diff.max()
