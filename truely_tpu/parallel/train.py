"""Mesh-sharded training step for the detector's learnable heads.

The reference has no training code at all (SURVEY.md §2.3); this provides
the TPU-native fine-tuning path for the two parts of the pipeline that are
products of training rather than converted checkpoints:

- the 68-landmark head (supervised L2 on crop-normalized coordinates), and
- the FaceNet embedder (consistency objective: embeddings of two jittered
  crops of the same face pulled together, different faces pushed apart —
  an NT-Xent/InfoNCE loss over the batch).

Sharding: batch DP over the 'data' axis (gradients all-reduced by XLA from
the sharding annotations), optional TP of the embedding projection over
'model' (parallel/sharding.tp_shard_facenet).  This is also the step
``__graft_entry__.dryrun_multichip`` compiles over an n-device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from truely_tpu.models.inception_resnet_v1 import apply_inception_resnet_v1
from truely_tpu.models.landmark68 import apply_landmark68


class TrainState(NamedTuple):
    params: dict        # {"facenet": ..., "landmark": ...}
    opt_state: optax.OptState
    step: jax.Array


class Batch(NamedTuple):
    crops_a: jax.Array    # (B, S, S, 3) f32 in [0, 1]
    crops_b: jax.Array    # (B, S, S, 3) second view of the same faces
    landmarks: jax.Array  # (B, 68, 2) targets in [0, 1]


def _loss_fn(params, batch: Batch, *, temperature: float, compute_dtype):
    emb_a = apply_inception_resnet_v1(params["facenet"], batch.crops_a, dtype=compute_dtype)
    emb_b = apply_inception_resnet_v1(params["facenet"], batch.crops_b, dtype=compute_dtype)
    # NT-Xent across the global batch: positives are (a_i, b_i).
    logits = (emb_a @ emb_b.T) / temperature  # (B, B), embeddings unit-norm
    labels = jnp.arange(logits.shape[0])
    nce = 0.5 * (
        optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        + optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    )
    pred = apply_landmark68(params["landmark"], batch.crops_a, dtype=compute_dtype)
    lmk = jnp.mean(jnp.square(pred - batch.landmarks))
    loss = nce + lmk
    return loss, {"loss": loss, "nce": nce, "landmark_mse": lmk}


def make_train_step(
    mesh: Optional[Mesh] = None,
    *,
    learning_rate: float = 1e-4,
    temperature: float = 0.1,
    # f32 by default: the conv transpose rules reject mixed bf16/f32
    # operand/cotangent pairs that preferred_element_type=f32 produces.
    compute_dtype=jnp.float32,
    data_axis: str = "data",
):
    """Build (init_fn, step_fn).  With a mesh, batches are DP-sharded over
    ``data_axis`` and params replicated (or TP-sharded by the caller); the
    gradient all-reduce comes out of XLA's sharding propagation."""
    tx = optax.adam(learning_rate)

    def init_fn(params) -> TrainState:
        return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))

    def step_fn(state: TrainState, batch: Batch):
        (_, metrics), grads = jax.value_and_grad(
            partial(_loss_fn, temperature=temperature, compute_dtype=compute_dtype),
            has_aux=True,
        )(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics

    if mesh is None:
        return init_fn, jax.jit(step_fn)

    batch_sharding = Batch(
        crops_a=NamedSharding(mesh, P(data_axis)),
        crops_b=NamedSharding(mesh, P(data_axis)),
        landmarks=NamedSharding(mesh, P(data_axis)),
    )
    step = jax.jit(step_fn, in_shardings=(None, batch_sharding))
    return init_fn, step
