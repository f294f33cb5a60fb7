"""exact_topk_lastdim must be bit-identical to jax.lax.top_k — values AND
indices, including tie-breaks — on every input shape the cascade produces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from truely_tpu.ops.topk import exact_topk_lastdim


def ref(p, k):
    v, i = jax.lax.top_k(jnp.asarray(p), k)
    return np.asarray(v), np.asarray(i)


@pytest.mark.parametrize("n", [1000, 4096, 50_000, 131_072 + 77])
@pytest.mark.parametrize("k", [16, 256])
def test_matches_lax_topk_random(n, k):
    rng = np.random.default_rng(n + k)
    p = rng.uniform(0, 1, (3, n)).astype(np.float32)
    rv, ri = ref(p, min(k, n))
    v, i = exact_topk_lastdim(jnp.asarray(p), k)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_matches_lax_topk_heavy_ties():
    """Quantized scores produce many exact duplicates; index tie-breaks
    must match the global top_k (lowest index first)."""
    rng = np.random.default_rng(0)
    p = np.round(rng.uniform(0, 1, (4, 100_000)) * 7).astype(np.float32) / 7
    rv, ri = ref(p, 256)
    v, i = exact_topk_lastdim(jnp.asarray(p), 256)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_matches_with_neg_inf_mask():
    """Masked (-inf-filled) regions, as the cascade's invalid cells use."""
    rng = np.random.default_rng(1)
    p = rng.uniform(0, 1, (2, 65_536)).astype(np.float32)
    p[:, ::3] = -1e30
    rv, ri = ref(p, 256)
    v, i = exact_topk_lastdim(jnp.asarray(p), 256)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_small_input_fallback():
    rng = np.random.default_rng(2)
    p = rng.uniform(0, 1, (2, 300)).astype(np.float32)
    rv, ri = ref(p, 256)
    v, i = exact_topk_lastdim(jnp.asarray(p), 256)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_matches_at_production_scale_recursive():
    """~4.2M cells, k=256 — the 1080p b128 shape class.  The inner top_k
    calls recurse through the prefilter (depth ~3); the result must stay
    bit-identical, ties and all."""
    rng = np.random.default_rng(3)
    p = np.round(rng.uniform(0, 1, (2, 2**22 + 131)) * 1023) / 1023
    p = p.astype(np.float32)
    rv, ri = ref(p, 256)
    v, i = exact_topk_lastdim(jnp.asarray(p), 256)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)
