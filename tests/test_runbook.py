"""Mock-mode drill of the real-weights runbook (VERDICT r4 task 8).

The real vggface2/MTCNN checkpoints are unfetchable here (no egress), so
``scripts/fetch_and_convert.sh`` can only run for real on a networked
machine.  This test keeps that first networked minute debugging-free by
driving the script end to end with locally generated fake torch
checkpoints (correct state-dict structure, random weights — the same
replicas the converter oracles use, tests/torch_refs.py):

- artifact presence skips the curl step (the script's resume contract);
- the pin-on-first-fetch SHA-256 manifest is written, then verified on a
  second run, and a tampered artifact FAILS the verification;
- the converter produces .npz weights that a Detector actually loads as
  pretrained.

``TRUELY_TPU_RUNBOOK_MANIFEST``/``TRUELY_TPU_RUNBOOK_GATES`` keep the
drill from touching the committed manifest or running the slow real-weight
gates (meaningless on fake weights).
"""

import os
import subprocess
import sys

import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fetch_and_convert.sh")


def _write_fake_ckpts(ckpt_dir):
    from tests import torch_refs

    os.makedirs(ckpt_dir, exist_ok=True)
    nets = {
        "pnet.pt": torch_refs.PNet(),
        "rnet.pt": torch_refs.RNet(),
        "onet.pt": torch_refs.ONet(),
        "20180402-114759-vggface2.pt": torch_refs.InceptionResnetV1(),
    }
    for name, net in nets.items():
        torch.save(net.state_dict(), os.path.join(ckpt_dir, name))


def _run(ckpt_dir, out_dir, manifest):
    env = dict(os.environ)
    env["TRUELY_TPU_RUNBOOK_MANIFEST"] = manifest
    env["TRUELY_TPU_RUNBOOK_GATES"] = "skip"
    # The converter subprocess must run on CPU like the test session.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        ["bash", SCRIPT, ckpt_dir, out_dir],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_runbook_mock_mode(tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    out_dir = str(tmp_path / "weights")
    manifest = str(tmp_path / "SHA256SUMS.facenet")
    _write_fake_ckpts(ckpt_dir)

    # First run: pins the manifest, converts, skips gates.
    proc = _run(ckpt_dir, out_dir, manifest)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert os.path.isfile(manifest)
    for name in ("pnet", "rnet", "onet", "facenet"):
        assert os.path.getsize(os.path.join(out_dir, f"{name}.npz")) > 0
    assert "gates skipped" in proc.stdout

    # The converted weights actually load as pretrained.
    sys.path.insert(0, REPO)
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    det = Detector(
        DetectorConfig(
            frame_batch=2, compute_dtype="float32",
            mtcnn=MTCNNConfig(pnet_topk_total=16, rnet_capacity=4,
                              onet_capacity=2),
        ),
        weights_dir=out_dir,
    )
    assert det.facenet_pretrained

    # Second run: verifies against the pinned manifest (sha256sum -c).
    proc2 = _run(ckpt_dir, out_dir, manifest)
    assert proc2.returncode == 0, proc2.stdout + proc2.stderr
    assert "OK" in proc2.stdout  # sha256sum -c per-file OK lines

    # Tampered artifact: verification must fail before any conversion.
    with open(os.path.join(ckpt_dir, "pnet.pt"), "ab") as f:
        f.write(b"corruption")
    proc3 = _run(ckpt_dir, out_dir, manifest)
    assert proc3.returncode != 0
