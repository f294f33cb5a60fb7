"""Quality gate for the 68-landmark head (VERDICT r2 task 7).

The reference ships dlib's shape predictor as a dead asset it never loads
(reference README.md:69-71; SURVEY.md §2.1 #16), so there is no reference
behavior to match — but our replacement must still be *demonstrably* a
working coordinate regressor, not just a net that initializes and
checkpoints.  No real landmark dataset is available offline, so the gate
pins accuracy on the synthetic localization task
(``models.landmark68.synthetic_landmark_batch``): random affine placements
of the canonical 68-point template drawn as bright dots on noise.

``tests/fixtures/landmark68_synth.npz`` is the committed checkpoint from
``scripts/train_landmark.py --landmark-only`` (800 steps, batch 64, lr 1e-3,
seed 0).  On a held-out seed it localizes to ~0.017 of the crop width per
point; an untrained head sits at ~0.74.  The gate asserts ≤ 0.035 — 2×
headroom over the measured value, 20× below untrained — so regressions in
the architecture, init, or apply path fail loudly while retrains with
benign numeric drift pass.

What this does and does not validate is recorded in STATUS.md: it proves
end-to-end coordinate regression through the conv trunk; real-face NME
(300-W / WFLW) still requires real data.
"""

import numpy as np
import pytest

from truely_tpu.models.landmark68 import apply_landmark68, synthetic_landmark_batch
from truely_tpu.models.weights import load_params

from tests.clip import fixture_path

HELD_OUT_SEED = 12345  # training used default_rng(0); this batch is unseen
GATE_MEAN_ERR = 0.035  # mean per-point L2 error, units of crop width


@pytest.fixture(scope="module")
def trained_params():
    return load_params(str(fixture_path("landmark68_synth.npz")))


def test_synthetic_heldout_accuracy(trained_params):
    rng = np.random.default_rng(HELD_OUT_SEED)
    crops, lmks = synthetic_landmark_batch(rng, 256)
    pred = np.asarray(apply_landmark68(trained_params, crops))
    assert pred.shape == (256, 68, 2)
    err = np.linalg.norm(pred - lmks, axis=-1)
    mean_err = float(err.mean())
    assert mean_err <= GATE_MEAN_ERR, (
        f"landmark head regressed: held-out mean point error {mean_err:.4f} "
        f"> gate {GATE_MEAN_ERR} (trained reference ~0.017, untrained ~0.74)"
    )


def test_gate_has_teeth(trained_params):
    """An untrained head must fail the same bar by a wide margin — guards
    against the gate silently passing everything."""
    import jax

    from truely_tpu.models import init_landmark68

    rng = np.random.default_rng(HELD_OUT_SEED)
    crops, lmks = synthetic_landmark_batch(rng, 64)
    fresh = init_landmark68(jax.random.PRNGKey(2))
    err = np.linalg.norm(np.asarray(apply_landmark68(fresh, crops)) - lmks, axis=-1)
    assert float(err.mean()) > 10 * GATE_MEAN_ERR


def test_predictions_in_unit_box(trained_params):
    """Trained predictions stay (loosely) inside the crop: the head output
    is consumed by overlay drawing which maps [0,1] through the face box."""
    rng = np.random.default_rng(HELD_OUT_SEED + 1)
    crops, _ = synthetic_landmark_batch(rng, 64)
    pred = np.asarray(apply_landmark68(trained_params, crops))
    assert pred.min() > -0.1 and pred.max() < 1.1
