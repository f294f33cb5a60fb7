"""Pipeline-parallel block chain: exactness vs the sequential loop.

Runs on the virtual 8-device CPU mesh (conftest).  The schedule must be
bit-exact: every block sees the same values in the same order as the
sequential loop, and the collection plumbing only adds zeros.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from truely_tpu.models.inception_resnet_v1 import _block17, _init_block17
from truely_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_block17,
    shard_stage_params,
    stack_block_params,
)


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.array(jax.devices()[:n]).reshape(shape), names)


def _toy_block(p, x):
    return jnp.tanh(x @ p["w"] + p["b"]) + x


def _toy_params(key, n_blocks, d):
    ks = jax.random.split(key, n_blocks)
    return [
        {
            "w": jax.random.normal(k, (d, d), jnp.float32) * 0.3,
            "b": jax.random.normal(k, (d,), jnp.float32) * 0.1,
        }
        for k in ks
    ]


def _sequential_per_microbatch(params, x, n_micro, block):
    """Sequential reference with the SAME microbatch row count as the
    pipeline, so dot tilings match and equality is bitwise."""
    mb = np.split(np.asarray(x), n_micro)
    outs = []
    for piece in mb:
        h = jnp.asarray(piece)
        for p in params:
            h = block(p, h)
        outs.append(np.asarray(h))
    return np.concatenate(outs)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (4, 8), (8, 8)])
def test_pipeline_matches_sequential_bitwise(n_stages, n_micro):
    l, d, b = 2 * n_stages, 16, n_micro * 2
    params = _toy_params(jax.random.PRNGKey(0), l, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)

    ref = _sequential_per_microbatch(params, x, n_micro, _toy_block)

    mesh = _mesh((n_stages,), ("stage",))
    stacked = shard_stage_params(mesh, stack_block_params(params))
    fn = pipeline_apply(mesh, _toy_block, n_microbatches=n_micro)
    out = fn(stacked, x)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipeline_matches_unsplit_batch_to_ulp():
    # vs a sequential pass over the UNSPLIT batch: agreement to f32 ulp
    # (XLA tiles dots differently per row count — a batch-splitting
    # property, not a pipeline one; see module docstring).
    l, d, b, n_micro = 4, 16, 8, 4
    params = _toy_params(jax.random.PRNGKey(7), l, d)
    x = jax.random.normal(jax.random.PRNGKey(8), (b, d), jnp.float32)
    ref = x
    for p in params:
        ref = _toy_block(p, ref)
    mesh = _mesh((2,), ("stage",))
    stacked = shard_stage_params(mesh, stack_block_params(params))
    fn = pipeline_apply(mesh, _toy_block, n_microbatches=n_micro)
    np.testing.assert_allclose(
        np.asarray(fn(stacked, x)), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pipeline_with_data_axis():
    n_stages, n_micro = 2, 2
    l, d, b = 4, 8, 8
    params = _toy_params(jax.random.PRNGKey(2), l, d)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, d), jnp.float32)

    # 4-way DP x 2-stage PP: each device sees 2 rows, microbatches of 1.
    ref = _sequential_per_microbatch(params, x, b, _toy_block)

    mesh = _mesh((4, 2), ("data", "stage"))
    stacked = shard_stage_params(mesh, stack_block_params(params))
    fn = pipeline_apply(
        mesh, _toy_block, n_microbatches=n_micro, data_axis="data"
    )
    out = fn(stacked, x)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipeline_block17_matches_repeat_chain():
    l, b = 4, 4
    keys = jax.random.split(jax.random.PRNGKey(4), l)
    params = [_init_block17(k) for k in keys]
    x = jax.random.normal(
        jax.random.PRNGKey(5), (b, 8, 8, 896), jnp.float32
    )

    ref = _sequential_per_microbatch(
        params, x, 2, lambda p, h: _block17(h, p, 0.10)
    )

    mesh = _mesh((2,), ("stage",))
    stacked, fn = pipeline_block17(mesh, params, n_microbatches=2)
    out = fn(stacked, x)
    # Convs compiled inside the scan body pick slightly different reduction
    # tilings than top-level ones (measured max abs err 7e-7 on f32 values
    # of magnitude ~5), so the conv chain asserts to ulp, not bitwise.
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=2e-6)


def test_stack_block_params_shapes():
    params = _toy_params(jax.random.PRNGKey(6), 6, 4)
    stacked = stack_block_params(params)
    assert stacked["w"].shape == (6, 4, 4)
    assert stacked["b"].shape == (6, 4)
