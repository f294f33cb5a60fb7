"""JAX-model + converter parity vs randomly-weighted torch oracles.

Strategy (SURVEY.md §4 "per-block numerical parity"): build the torch
architecture replicas (tests/torch_refs.py), randomize their weights,
convert the resulting state_dict via convert_torch_state_dict, and require
the NHWC JAX forward to match the NCHW torch forward at f32.  If these pass,
real public checkpoints convert and behave identically.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from truely_tpu.models import (
    init_pnet, apply_pnet,
    init_rnet, apply_rnet,
    init_onet, apply_onet,
    init_inception_resnet_v1, apply_inception_resnet_v1,
    init_landmark68, apply_landmark68,
)
from truely_tpu.models.weights import (
    convert_torch_state_dict, save_params, load_params,
)
from tests import torch_refs

HIGH = jax.lax.Precision.HIGHEST


def randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
    module.load_state_dict(sd)
    module.eval()
    return module


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


@pytest.mark.parametrize("hw", [(12, 12), (55, 97)])
def test_pnet_parity(hw):
    net = randomize(torch_refs.PNet(), 0)
    params = convert_torch_state_dict(init_pnet(jax.random.PRNGKey(0)), net.state_dict())
    x = np.random.default_rng(0).normal(size=(2, *hw, 3)).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = net(nchw(x))
    prob, reg = apply_pnet(params, jnp.asarray(x), precision=HIGH)
    np.testing.assert_allclose(
        np.asarray(prob), prob_t[:, 1].numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(reg), reg_t.permute(0, 2, 3, 1).numpy(), atol=2e-5)


def test_rnet_parity():
    net = randomize(torch_refs.RNet(), 1)
    params = convert_torch_state_dict(init_rnet(jax.random.PRNGKey(0)), net.state_dict())
    x = np.random.default_rng(1).normal(size=(4, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = net(nchw(x))
    prob, reg = apply_rnet(params, jnp.asarray(x), precision=HIGH)
    np.testing.assert_allclose(np.asarray(prob), prob_t[:, 1].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), atol=2e-5)


def test_onet_parity():
    net = randomize(torch_refs.ONet(), 2)
    params = convert_torch_state_dict(init_onet(jax.random.PRNGKey(0)), net.state_dict())
    x = np.random.default_rng(2).normal(size=(4, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        reg_t, lmk_t, prob_t = net(nchw(x))
    prob, reg, lmk = apply_onet(params, jnp.asarray(x), precision=HIGH)
    # Random (unnormalized) weights amplify f32 noise through the 1152-wide
    # dense layer; outputs are O(30), so this is ~3e-5 relative.
    np.testing.assert_allclose(np.asarray(prob), prob_t[:, 1].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lmk), lmk_t.numpy(), atol=1e-3)


@pytest.mark.parametrize("size", [80, 160])
def test_inception_resnet_v1_parity(size):
    net = randomize(torch_refs.InceptionResnetV1(), 3)
    params = convert_torch_state_dict(
        init_inception_resnet_v1(jax.random.PRNGKey(0)), net.state_dict())
    x = np.random.default_rng(3).uniform(0, 1, size=(2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        emb_t = net(nchw(x)).numpy()
    emb = np.asarray(apply_inception_resnet_v1(params, jnp.asarray(x), precision=HIGH))
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(emb, emb_t, atol=5e-4)
    # Embeddings are unit-norm.
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_save_load_roundtrip(tmp_path):
    params = init_rnet(jax.random.PRNGKey(5))
    path = str(tmp_path / "rnet.npz")
    save_params(path, params)
    loaded = load_params(path)
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(loaded)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure preserved (same treedef)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(loaded))


def test_irv1_roundtrip_through_npz(tmp_path):
    net = randomize(torch_refs.InceptionResnetV1(), 4)
    params = convert_torch_state_dict(
        init_inception_resnet_v1(jax.random.PRNGKey(0)), net.state_dict())
    path = str(tmp_path / "facenet.npz")
    save_params(path, params)
    loaded = load_params(path)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 80, 80, 3)), jnp.float32)
    a = apply_inception_resnet_v1(params, x, precision=HIGH)
    b = apply_inception_resnet_v1(loaded, x, precision=HIGH)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_landmark68_shapes():
    params = init_landmark68(jax.random.PRNGKey(0))
    x = jnp.zeros((3, 80, 80, 3), jnp.float32)
    out = apply_landmark68(params, x)
    assert out.shape == (3, 68, 2)


def test_convert_missing_key_raises():
    net = randomize(torch_refs.RNet(), 1)
    sd = dict(net.state_dict())
    del sd["conv1.weight"]
    with pytest.raises(KeyError):
        convert_torch_state_dict(init_rnet(jax.random.PRNGKey(0)), sd)


def test_fold_batchnorm_equivalence():
    from truely_tpu.models.weights import fold_batchnorm

    net = randomize(torch_refs.InceptionResnetV1(), 7)
    params = convert_torch_state_dict(
        init_inception_resnet_v1(jax.random.PRNGKey(0)), net.state_dict())
    folded = fold_batchnorm(params)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (2, 80, 80, 3)), jnp.float32)
    a = np.asarray(apply_inception_resnet_v1(params, x, precision=HIGH))
    b = np.asarray(apply_inception_resnet_v1(folded, x, precision=HIGH))
    np.testing.assert_allclose(a, b, atol=2e-4)
    # folded convs gained biases; bn is an exact no-op
    assert "b" in folded["conv2d_1a"]["conv"]
    np.testing.assert_allclose(
        np.asarray(folded["conv2d_1a"]["bn"]["gamma"]), 1.0)
