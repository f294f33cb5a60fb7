"""Width-folded P-Net trunk (ops/fold.py, mtcnn_nets.apply_pnet_trunk_folded)
vs the direct trunk: same math, folded layout.

The folded path is the production TPU formulation (MXU-shaped channel
counts); these tests pin it to the direct trunk in float32 on CPU across
widths that exercise every padding branch (w % 4, odd/even block counts,
ceil-pool tails), and check the full cascade produces identical decisions
when only the trunk formulation changes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from truely_tpu.config import MTCNNConfig
from truely_tpu.models.mtcnn_nets import (
    apply_pnet_trunk, apply_pnet_trunk_folded, init_pnet, init_rnet,
    init_onet,
)
from truely_tpu.ops.fold import fold_width, phase_select
from truely_tpu.pipeline.mtcnn import MTCNNParams, PNET_FOLD, detect_faces


def _normalize(x):
    return (x.astype(jnp.float32) - 127.5) * 0.0078125


def test_fold_width_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, 5, 13, 3), dtype=np.uint8))
    f = fold_width(x, 4)
    assert f.shape == (2, 5, 4, 12)
    # Phase-major: block bx channel p*3+c == pixel bx*4+p channel c.
    back = np.asarray(f).reshape(2, 5, 4, 4, 3).reshape(2, 5, 16, 3)
    assert (back[:, :, :13] == np.asarray(x)).all()
    assert (back[:, :, 13:] == 0).all()


def test_phase_select():
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.normal(size=(3, 7, 4 * 5)).astype(np.float32))
    phase = jnp.asarray(rng.integers(0, 4, (3, 7)), jnp.int32)
    out = np.asarray(phase_select(rows, phase, 5, 4))
    r = np.asarray(rows).reshape(3, 7, 4, 5)
    q = np.asarray(phase)
    for i in range(3):
        for j in range(7):
            assert (out[i, j] == r[i, j, q[i, j]]).all()


@pytest.mark.parametrize("h,w", [(14, 15), (17, 18), (16, 21), (23, 24),
                                 (22, 97), (31, 100)])
def test_folded_trunk_matches_direct(h, w):
    params = init_pnet(jax.random.PRNGKey(3))
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
    x = _normalize(jnp.asarray(frames))

    from truely_tpu.models.mtcnn_nets import apply_pnet

    prob, reg = apply_pnet(params, x)
    probf, regf = apply_pnet_trunk_folded(
        params, _normalize(fold_width(jnp.asarray(frames), PNET_FOLD)), w,
        fold=PNET_FOLD,
    )

    b, hp, wp = prob.shape
    assert probf.shape[0] == b and probf.shape[1] == hp
    s = probf.shape[2]
    assert s >= wp
    pf = np.asarray(probf)
    # Valid slots match the direct trunk (f32, different contraction order).
    np.testing.assert_allclose(pf[:, :, :wp], np.asarray(prob), atol=2e-5)
    # Garbage tail slots are forced to -1 so zero-threshold configs reject.
    assert (pf[:, :, wp:] == -1.0).all()

    # reg: slot s -> folded row s // F, channels [(s % F)*4 : +4].
    rf = np.asarray(regf)
    rd = np.asarray(reg)
    wb = regf.shape[2]
    rfr = rf.reshape(b, hp, wb, PNET_FOLD, 4)
    for sl in [0, 1, wp // 2, wp - 1]:
        np.testing.assert_allclose(
            rfr[:, :, sl // PNET_FOLD, sl % PNET_FOLD], rd[:, :, sl],
            atol=2e-5,
        )


def test_cascade_folded_invariance_360p_production_pyramid():
    """Folded == direct at a product resolution: the 360p pyramid's 12
    levels hit every width-padding branch (w % 4, odd/even block counts,
    odd/even valid widths) in one cascade."""
    params = MTCNNParams(
        pnet=init_pnet(jax.random.PRNGKey(21)),
        rnet=init_rnet(jax.random.PRNGKey(22)),
        onet=init_onet(jax.random.PRNGKey(23)),
    )
    rng = np.random.default_rng(9)
    frames = jnp.asarray(
        rng.integers(0, 256, (1, 360, 640, 3), dtype=np.uint8)
    )
    cfgs = [
        MTCNNConfig(thresholds=(0.0, 0.0, 0.0), nms_max_rounds=0,
                    use_folded_pnet=flag)
        for flag in (False, True)
    ]
    da = detect_faces(params, frames, cfgs[0], dtype=None, precision=None)
    db = detect_faces(params, frames, cfgs[1], dtype=None, precision=None)
    va, vb = np.asarray(da.valid), np.asarray(db.valid)
    assert (va == vb).all()
    np.testing.assert_allclose(
        np.asarray(da.boxes)[va], np.asarray(db.boxes)[vb], atol=1e-3
    )


def test_cascade_decisions_invariant_to_folded_trunk():
    """detect_faces with the folded trunk == direct trunk (f32 CPU):
    same valid set, same boxes/scores to float tolerance."""
    params = MTCNNParams(
        pnet=init_pnet(jax.random.PRNGKey(11)),
        rnet=init_rnet(jax.random.PRNGKey(12)),
        onet=init_onet(jax.random.PRNGKey(13)),
    )
    rng = np.random.default_rng(5)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, 73, 97, 3), dtype=np.uint8)
    )
    cfg_direct = MTCNNConfig(
        thresholds=(0.0, 0.0, 0.0), nms_max_rounds=0, use_folded_pnet=False
    )
    cfg_folded = MTCNNConfig(
        thresholds=(0.0, 0.0, 0.0), nms_max_rounds=0, use_folded_pnet=True
    )
    da = detect_faces(params, frames, cfg_direct, dtype=None, precision=None)
    db = detect_faces(params, frames, cfg_folded, dtype=None, precision=None)
    va, vb = np.asarray(da.valid), np.asarray(db.valid)
    assert (va == vb).all()
    np.testing.assert_allclose(
        np.asarray(da.boxes)[va], np.asarray(db.boxes)[vb], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(da.scores)[va], np.asarray(db.scores)[vb], atol=1e-4
    )
