"""Pallas NMS kernel equivalence vs the XLA fixpoint (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from truely_tpu.ops.nms import nms_masked_batch
from truely_tpu.ops.nms_pallas import nms_masked_batch_pallas
from tests.test_boxes_nms import random_boxes


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("method", ["union", "min"])
@pytest.mark.parametrize("k", [100, 128, 256])
def test_pallas_matches_xla(seed, method, k):
    rng = np.random.default_rng(seed)
    b = 3
    boxes = np.stack([random_boxes(rng, k) for _ in range(b)])
    scores = rng.uniform(0.1, 1.0, (b, k)).astype(np.float32)
    valid = rng.random((b, k)) > 0.3
    ref = np.asarray(nms_masked_batch(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.5, method=method))
    got = np.asarray(nms_masked_batch_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.5, method=method, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_bounded_rounds():
    rng = np.random.default_rng(2)
    b, k = 2, 128
    boxes = np.stack([random_boxes(rng, k) for _ in range(b)])
    scores = rng.uniform(0.1, 1.0, (b, k)).astype(np.float32)
    valid = np.ones((b, k), bool)
    ref = np.asarray(nms_masked_batch(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.5, max_rounds=64))
    got = np.asarray(nms_masked_batch_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.5, max_rounds=64, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_all_invalid():
    got = np.asarray(nms_masked_batch_pallas(
        jnp.zeros((2, 128, 4)), jnp.zeros((2, 128)), jnp.zeros((2, 128), bool),
        iou_threshold=0.5, interpret=True))
    assert not got.any()
