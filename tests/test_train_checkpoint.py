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


def test_checkpoint_restores_across_topologies(tmp_path):
    """Elastic recovery: state saved from a 4-way DP mesh restores onto a
    2-way mesh (and onto a single device) with identical values, landing
    on the TEMPLATE's shardings — restore_args carry sharding from the
    template, not the file, so a topology change between save and restore
    is safe."""
    mesh4 = make_mesh((4, 1), ("data", "model"), devices=jax.devices()[:4])
    init_fn, step_fn = make_train_step(mesh4, compute_dtype=jnp.float32)
    state = init_fn(replicate(mesh4, tiny_params()))
    with jax.set_mesh(mesh4):
        batch = jax.device_put(tiny_batch(b=8), Batch(
            crops_a=dp_spec(mesh4), crops_b=dp_spec(mesh4),
            landmarks=dp_spec(mesh4),
        ))
        state, _ = step_fn(state, batch)
    ckpt_dir = str(tmp_path / "ckpt4")
    save_train_state(ckpt_dir, state)

    # Restore onto a DIFFERENT mesh (2 devices, disjoint from the first
    # two of mesh4's ordering is fine — shardings come from the template).
    mesh2 = make_mesh((2, 1), ("data", "model"), devices=jax.devices()[4:6])
    init2, step2 = make_train_step(mesh2, compute_dtype=jnp.float32)
    with jax.set_mesh(mesh2):
        # template built IN the mesh context so scalar leaves (opt counts)
        # land on the mesh too, not the default device.
        template2 = init2(replicate(mesh2, tiny_params()))
    restored2 = restore_train_state(ckpt_dir, template2)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and training continues on the new topology
    with jax.set_mesh(mesh2):
        batch2 = jax.device_put(tiny_batch(b=4), Batch(
            crops_a=dp_spec(mesh2), crops_b=dp_spec(mesh2),
            landmarks=dp_spec(mesh2),
        ))
        state2, _ = step2(restored2, batch2)
    assert int(state2.step) == int(state.step) + 1

    # single-device template restores too
    init1, _ = make_train_step(compute_dtype=jnp.float32)
    template1 = init1(tiny_params())
    restored1 = restore_train_state(ckpt_dir, template1)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
