"""Box-algebra and masked-NMS parity vs numpy oracles.

Oracles re-state the greedy numpy NMS / regression semantics that
facenet_pytorch provides to reference server/model.py:47 (the +1 MATLAB
width convention, 'Union' and 'Min' modes, score-sorted greedy suppression).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from truely_tpu.ops.boxes import bbreg, rerec, pad_crop_bounds, clip_boxes, iou_matrix
from truely_tpu.ops.nms import nms_masked, nms_masked_batch, topk_select


def oracle_nms(boxes, scores, threshold, method):
    """Greedy numpy NMS with the +1 area convention."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), dtype=bool)
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        if method == "min":
            o = inter / np.minimum(area[i], area)
        else:
            o = inter / (area[i] + area - inter)
        suppressed |= o > threshold
        suppressed[i] = True  # self; already kept
    return keep


def random_boxes(rng, n, w=640, h=360):
    x1 = rng.uniform(0, w * 0.8, n)
    y1 = rng.uniform(0, h * 0.8, n)
    bw = rng.uniform(5, w * 0.4, n)
    bh = rng.uniform(5, h * 0.4, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("method", ["union", "min"])
@pytest.mark.parametrize("thr", [0.5, 0.7])
def test_nms_matches_oracle(seed, method, thr):
    rng = np.random.default_rng(seed)
    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.5, 1.0, n).astype(np.float32)
    n_valid = 50
    valid = np.arange(n) < n_valid

    expect = oracle_nms(boxes[:n_valid], scores[:n_valid], thr, method)
    got = np.asarray(
        nms_masked(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            iou_threshold=thr, method=method,
        )
    )
    np.testing.assert_array_equal(got[:n_valid], expect)
    assert not got[n_valid:].any()


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("method", ["union", "min"])
def test_nms_batch_equals_vmapped_single(seed, method):
    rng = np.random.default_rng(seed)
    b, n = 4, 48
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0.1, 1.0, (b, n)).astype(np.float32)
    valid = rng.random((b, n)) > 0.4
    got = np.asarray(
        nms_masked_batch(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            iou_threshold=0.5, method=method,
        )
    )
    for i in range(b):
        single = np.asarray(
            nms_masked(
                jnp.asarray(boxes[i]), jnp.asarray(scores[i]), jnp.asarray(valid[i]),
                iou_threshold=0.5, method=method,
            )
        )
        np.testing.assert_array_equal(got[i], single)


def test_nms_batch_bounded_rounds_matches_exact_on_shallow_chains():
    rng = np.random.default_rng(5)
    b, n = 4, 48
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0.1, 1.0, (b, n)).astype(np.float32)
    valid = np.ones((b, n), bool)
    exact = np.asarray(nms_masked_batch(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.5, max_rounds=0))
    bounded = np.asarray(nms_masked_batch(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.5, max_rounds=64))
    np.testing.assert_array_equal(exact, bounded)


def test_nms_batch_all_invalid():
    boxes = jnp.zeros((2, 8, 4))
    keep = np.asarray(
        nms_masked_batch(
            boxes, jnp.zeros((2, 8)), jnp.zeros((2, 8), bool), iou_threshold=0.5
        )
    )
    assert not keep.any()


def test_nms_degenerate_identical_boxes():
    boxes = np.tile(np.array([[10.0, 10.0, 50.0, 50.0]], np.float32), (8, 1))
    scores = np.linspace(0.9, 0.2, 8).astype(np.float32)
    keep = np.asarray(
        nms_masked(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(8, bool),
            iou_threshold=0.5,
        )
    )
    assert keep.sum() == 1 and keep[0]


def test_bbreg_rerec_oracle():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 16)
    reg = rng.uniform(-0.2, 0.2, (16, 4)).astype(np.float32)
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    expect = boxes + reg * np.stack([w, h, w, h], axis=1)
    got = np.asarray(bbreg(jnp.asarray(boxes), jnp.asarray(reg)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)

    sq = np.asarray(rerec(jnp.asarray(boxes)))
    side_w = sq[:, 2] - sq[:, 0]
    side_h = sq[:, 3] - sq[:, 1]
    np.testing.assert_allclose(side_w, side_h, rtol=1e-5)
    np.testing.assert_allclose(side_w, np.maximum(boxes[:, 2] - boxes[:, 0],
                                                  boxes[:, 3] - boxes[:, 1]), rtol=1e-5)
    # centers preserved
    np.testing.assert_allclose(sq[:, 0] + sq[:, 2], boxes[:, 0] + boxes[:, 2], rtol=1e-5)


def test_pad_crop_bounds():
    boxes = jnp.asarray([
        [-5.7, -3.2, 100.9, 50.1],   # clamp left/top; trunc
        [10.0, 10.0, 9999.0, 9999.0],  # clamp right/bottom
        [5.5, 6.5, 20.4, 30.9],
    ])
    out = np.asarray(pad_crop_bounds(boxes, width=640, height=360))
    np.testing.assert_array_equal(out[0], [0, 0, 100, 50])
    np.testing.assert_array_equal(out[1], [9, 9, 640, 360])
    np.testing.assert_array_equal(out[2], [4, 5, 20, 30])


def test_clip_boxes():
    boxes = jnp.asarray([[-10.0, -10.0, 700.0, 400.0]])
    out = np.asarray(clip_boxes(boxes, 640, 360))
    np.testing.assert_array_equal(out[0], [0, 0, 640, 360])


def test_iou_matrix_diag_is_one():
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(random_boxes(rng, 8))
    m = np.asarray(iou_matrix(boxes))
    np.testing.assert_allclose(np.diag(m), 1.0, rtol=1e-6)
    np.testing.assert_allclose(m, m.T, rtol=1e-6)


def test_topk_select():
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7, 0.3])
    valid = jnp.asarray([True, True, False, True, True])
    idx, v = topk_select(scores, valid, 3)
    assert list(np.asarray(idx)) == [1, 3, 4]
    assert np.asarray(v).all()
    idx, v = topk_select(scores, jnp.asarray([True, False, False, False, False]), 3)
    assert np.asarray(v).tolist() == [True, False, False]
