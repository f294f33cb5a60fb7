"""Training-step + checkpoint/resume tests on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from truely_tpu.models import init_inception_resnet_v1, init_landmark68
from truely_tpu.parallel.checkpoint import (
    save_train_state, restore_train_state, latest_step,
)
from truely_tpu.parallel.mesh import make_mesh
from truely_tpu.parallel.sharding import dp_spec, replicate
from truely_tpu.parallel.train import Batch, make_train_step


def tiny_params():
    return {
        "facenet": init_inception_resnet_v1(jax.random.PRNGKey(0)),
        "landmark": init_landmark68(jax.random.PRNGKey(1)),
    }


def tiny_batch(b=4, s=80):
    rng = np.random.default_rng(0)
    return Batch(
        crops_a=jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32),
        crops_b=jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32),
        landmarks=jnp.asarray(rng.uniform(0, 1, (b, 68, 2)), jnp.float32),
    )


@pytest.fixture(scope="module")
def trained_state():
    init_fn, step_fn = make_train_step(compute_dtype=jnp.float32)
    state = init_fn(tiny_params())
    batch = tiny_batch()
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_loss_decreases(trained_state):
    _, losses = trained_state
    assert losses[-1] < losses[0]


def test_step_counter(trained_state):
    state, _ = trained_state
    assert int(state.step) == 3


def test_dp_sharded_training_matches_single_device():
    mesh = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    params = tiny_params()
    batch = tiny_batch(b=8)

    init_fn, step_fn = make_train_step(compute_dtype=jnp.float32)
    state_single, m_single = step_fn(init_fn(params), batch)

    with jax.set_mesh(mesh):
        init_fn2, step_fn2 = make_train_step(mesh, compute_dtype=jnp.float32)
        state_sharded = init_fn2(replicate(mesh, params))
        sharded_batch = jax.device_put(
            batch, Batch(dp_spec(mesh), dp_spec(mesh), dp_spec(mesh))
        )
        state_sharded, m_sharded = step_fn2(state_sharded, sharded_batch)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
    )
    # spot-check a parameter after the update
    a = np.asarray(state_single.params["landmark"]["dense_out"]["w"])
    b = np.asarray(state_sharded.params["landmark"]["dense_out"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, trained_state):
    state, _ = trained_state
    ckpt_dir = str(tmp_path / "ckpt")
    save_train_state(ckpt_dir, state)
    assert latest_step(ckpt_dir) == 3

    init_fn, step_fn = make_train_step(compute_dtype=jnp.float32)
    template = init_fn(tiny_params())
    restored = restore_train_state(ckpt_dir, template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues from the restored state
    state2, _ = step_fn(restored, tiny_batch())
    assert int(state2.step) == 4
