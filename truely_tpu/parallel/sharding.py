"""Sharding the detector over a device mesh.

Strategy (SURVEY.md §2.3, designed — the reference is single-frame CPU):

- **DP over frames** ('data' axis): a frame batch is embarrassingly parallel
  through decode-side sampling, the MTCNN cascade, and FaceNet embedding.
  Inputs get a NamedSharding on the batch axis; everything jit-compiled from
  there, XLA inserting collectives only where the program needs them.
- **SP over the timeline**: the only cross-frame dependency is the
  resettable run-length scan, which is associative (ops/temporal.py), so
  ``jax.lax.associative_scan`` over a 'data'-sharded timeline compiles to a
  log-depth tree with ICI collectives — per-video scoring stays exact.
- **TP over the embedder** ('model' axis): the models are small (<30 M
  params) so weights stay replicated by default; as a demonstration (and for
  very large meshes) the 1792x512 embedding projection can be column-sharded
  with ``tp_shard_facenet``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from truely_tpu.config import DetectorConfig
from truely_tpu.ops.temporal import temporal_consistency
from truely_tpu.pipeline.detector import DetectorParams, _frame_step


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def dp_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def tp_shard_facenet(mesh: Mesh, params: DetectorParams, axis: str = "model") -> DetectorParams:
    """Column-shard the FaceNet embedding projection over the model axis.

    The matmul ``(B, 1792) @ (1792, 512)`` becomes column-parallel: each
    shard computes a 512/T slice, and the following batchnorm/normalize run
    on the gathered embedding (XLA inserts the all-gather).
    """
    facenet = dict(params.facenet)
    ll = dict(facenet["last_linear"])
    ll["w"] = jax.device_put(ll["w"], NamedSharding(mesh, P(None, axis)))
    facenet["last_linear"] = ll
    return params._replace(facenet=facenet)


def shard_frame_step(
    mesh: Mesh,
    config: Optional[DetectorConfig] = None,
    *,
    data_axis: str = "data",
    yuv: bool = False,
    propagate: bool = False,
    refine_rows: Optional[int] = None,
    multiface: bool = False,
):
    """jit the per-batch detector step with the frame axis sharded over
    ``data_axis``.  Returns fn(params, frames) with frames (B, H, W, 3) —
    or packed I420 (B, H*3//2, W) with ``yuv=True`` (the on-device exact
    conversion runs shard-local; no extra collectives) — and B divisible
    by the data-axis size.  ``propagate=True`` returns the track-propagated
    refinement step fn(params, frames, seed_boxes, seed_valid) instead
    (config.detect_interval > 1): frames stay DP-sharded, the tiny (B/K,)
    seeds replicate, and XLA selects each shard's slice of the broadcast.
    ``multiface=True`` selects the per-track steps (BASELINE config 4):
    the full step returns (boxes (B,T,4), valid (B,T), emb (B,T,512)), the
    propagate step takes (B/K, T)-shaped seeds, and ``refine_rows=F``
    selects the StreamScheduler's (S, T)-seeded all-rows refinement."""
    from truely_tpu.pipeline.detector import (
        _frame_step_propagate, _frame_step_propagate_yuv,
        _frame_step_refine, _frame_step_refine_yuv, _frame_step_yuv,
        _multiface_step, _multiface_step_propagate,
        _multiface_step_propagate_yuv, _multiface_step_refine,
        _multiface_step_refine_yuv, _multiface_step_yuv,
    )

    config = config or DetectorConfig()
    compute_dtype = jnp.dtype(config.compute_dtype)
    if multiface:
        frames_sharding = NamedSharding(mesh, P(data_axis))
        if refine_rows:
            # StreamScheduler multi-face propagate mode: every row refines
            # from its stream's (T,) track seeds (no keyframe rows —
            # keyframes are whole scheduler steps).  frames DP-sharded,
            # (S, T) seeds replicated.
            fn = partial(
                _multiface_step_refine_yuv if yuv
                else _multiface_step_refine,
                cfg=config, compute_dtype=compute_dtype,
                rows_per_seed=refine_rows,
            )
            return jax.jit(
                fn, in_shardings=(None, frames_sharding, None, None)
            )
        if propagate:
            fn = partial(
                _multiface_step_propagate_yuv if yuv
                else _multiface_step_propagate,
                cfg=config, compute_dtype=compute_dtype,
            )
            return jax.jit(
                fn, in_shardings=(None, frames_sharding, None, None)
            )
        fn = partial(
            _multiface_step_yuv if yuv else _multiface_step,
            cfg=config, compute_dtype=compute_dtype,
        )
        return jax.jit(fn, in_shardings=(None, frames_sharding))
    if refine_rows:
        # StreamScheduler propagate mode: every row refines from its
        # stream's carried seed (no keyframe rows — keyframes are whole
        # scheduler steps).  frames DP-sharded, (S,) seeds replicated.
        fn = partial(
            _frame_step_refine_yuv if yuv else _frame_step_refine,
            cfg=config, compute_dtype=compute_dtype,
            rows_per_seed=refine_rows,
        )
        frames_sharding = NamedSharding(mesh, P(data_axis))
        return jax.jit(
            fn, in_shardings=(None, frames_sharding, None, None)
        )
    if propagate:
        fn = partial(
            _frame_step_propagate_yuv if yuv else _frame_step_propagate,
            cfg=config, compute_dtype=compute_dtype,
        )
        frames_sharding = NamedSharding(mesh, P(data_axis))
        return jax.jit(
            fn, in_shardings=(None, frames_sharding, None, None)
        )
    fn = partial(
        _frame_step_yuv if yuv else _frame_step,
        cfg=config, compute_dtype=compute_dtype,
    )
    frames_sharding = NamedSharding(mesh, P(data_axis))
    return jax.jit(fn, in_shardings=(None, frames_sharding))


def sharded_temporal(
    mesh: Mesh,
    config: Optional[DetectorConfig] = None,
    *,
    data_axis: str = "data",
):
    """Whole-timeline temporal pass with the timeline sharded over the mesh
    (sequence parallelism): the associative scan's carry crosses shard
    boundaries via XLA collectives; results are exact."""
    config = config or DetectorConfig()

    def fn(embeddings, has_face, n_sampled):
        return temporal_consistency(
            embeddings, has_face, n_sampled,
            similarity_threshold=config.similarity_threshold,
            run_length_threshold=config.run_length_threshold,
        )

    seq_sharding = NamedSharding(mesh, P(data_axis))
    return jax.jit(fn, in_shardings=(seq_sharding, seq_sharding, None))
