"""GPipe-style pipeline parallelism over a homogeneous block chain.

The reference is a single-process CPU program with no distribution at all
(SURVEY.md §2.3); this module supplies the TPU-native pipeline-parallel
pattern for the deepest part of the flagship embedder — the repeated
Inception-ResNet blocks (e.g. the 10x Block17 chain,
models/inception_resnet_v1.py) whose activations keep one shape/dtype from
block to block:

- stack the per-block param pytrees along a leading "layer" axis and shard
  that axis over the mesh's ``stage`` axis (each device holds a contiguous
  group of blocks);
- run the microbatched GPipe schedule inside ``shard_map``: at every step a
  stage computes its block group on its current activation and hands the
  result to the next stage with ``lax.ppermute`` (one hop over ICI);
- stage 0 injects a fresh microbatch per step, the last stage banks its
  result; after ``M + S - 1`` steps the output is replicated across stages
  with one ``psum`` (all other stages hold exact zeros, so the sum is the
  last stage's value, bit-for-bit).

The schedule is exact: every block sees the same values in the same order
as the sequential loop, and the mask/psum plumbing only ever adds zeros —
run per-microbatch, results are bitwise equal to the sequential loop
(tests/test_pipeline.py).  Against a sequential pass over the UNSPLIT
batch, results agree to f32 ulp only, because XLA tiles a dot's reduction
differently for different row counts; that is a property of batch
splitting itself, not of the pipeline.  Bubble fraction is the usual
``(S - 1) / (M + S - 1)``; pick ``n_microbatches >= 4 * n_stages`` for
real runs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(params_list: Sequence[Any]):
    """Stack identically-structured per-block pytrees along a new leading
    "layer" axis (leaf ``(a, b, ...)`` -> ``(L, a, b, ...)``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def shard_stage_params(mesh: Mesh, stacked, *, stage_axis: str = "stage"):
    """Place stacked block params with the layer axis sharded over
    ``stage_axis`` — device s holds blocks ``[s*L/S, (s+1)*L/S)``."""
    return jax.device_put(stacked, NamedSharding(mesh, P(stage_axis)))


def pipeline_apply(
    mesh: Mesh,
    block_fn: Callable[[Any, jax.Array], jax.Array],
    *,
    n_microbatches: int,
    stage_axis: str = "stage",
    data_axis: Optional[str] = None,
):
    """Build ``fn(stacked_params, x) -> y`` applying the whole block chain
    under the GPipe schedule.

    ``block_fn(params_i, x)`` must map one block's (unstacked) params and an
    activation to an activation of the SAME shape and dtype (residual
    blocks).  ``stacked_params`` leaves carry the leading layer axis L with
    ``L % n_stages == 0``; ``x`` is ``(B, ...)`` with ``B`` divisible by
    ``n_microbatches`` (after any ``data_axis`` sharding).  The result is
    bitwise equal to the sequential ``for p in blocks: x = block_fn(p, x)``
    applied per microbatch (see module docstring on batch-splitting ulp).
    """
    n_stages = mesh.shape[stage_axis]
    m = n_microbatches
    fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def group(local_params, x):
        n_local = jax.tree_util.tree_leaves(local_params)[0].shape[0]
        for i in range(n_local):
            x = block_fn(jax.tree.map(lambda a: a[i], local_params), x)
        return x

    def local_fn(local_params, x):
        stage = lax.axis_index(stage_axis)
        mb = x.reshape(m, x.shape[0] // m, *x.shape[1:])
        zero_mb = jnp.zeros_like(mb[0])
        outputs0 = jnp.zeros_like(mb)

        def body(carry, t):
            recv, outputs = carry
            mb_t = lax.dynamic_index_in_dim(
                mb, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            x_in = jnp.where(stage == 0, mb_t, recv)
            y = group(local_params, x_in)
            out_idx = t - (n_stages - 1)
            write = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            safe = jnp.clip(out_idx, 0, m - 1)
            cur = lax.dynamic_index_in_dim(outputs, safe, 0, keepdims=False)
            outputs = lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, y, cur), safe, 0
            )
            if fwd:
                recv = lax.ppermute(y, stage_axis, fwd)
            return (recv, outputs), None

        (_, outputs), _ = lax.scan(
            body, (zero_mb, outputs0), jnp.arange(m + n_stages - 1)
        )
        # Non-final stages never write: their buffers are exact zeros, so
        # one psum replicates the final stage's outputs across the axis.
        outputs = lax.psum(outputs, stage_axis)
        return outputs.reshape(x.shape)

    x_spec = P(data_axis) if data_axis else P()
    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(stage_axis), x_spec),
            out_specs=x_spec,
            check_vma=False,
        )
    )


def pipeline_block17(
    mesh: Mesh,
    block17_params: Sequence[Any],
    *,
    n_microbatches: int,
    scale: float = 0.10,
    stage_axis: str = "stage",
    data_axis: Optional[str] = None,
    dtype=None,
    precision=None,
):
    """Pipeline the IRv1 Block17 repeat chain (models/inception_resnet_v1.py
    ``repeat_2``; reference semantics: facenet InceptionResnetV1's 10
    ``Block17`` modules).  Returns ``(stacked_sharded_params, fn)`` with
    ``fn(params, x)`` for f32 activations ``(B, H, W, 896)``."""
    from truely_tpu.models.inception_resnet_v1 import _block17

    stacked = shard_stage_params(
        mesh, stack_block_params(block17_params), stage_axis=stage_axis
    )
    def block(p, x):
        return _block17(x, p, scale, dtype=dtype, precision=precision)
    fn = pipeline_apply(
        mesh,
        block,
        n_microbatches=n_microbatches,
        stage_axis=stage_axis,
        data_axis=data_axis,
    )
    return stacked, fn
