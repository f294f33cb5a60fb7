"""CLI smoke tests (the SURVEY.md §7 minimum end-to-end slice driver)."""

import json

import numpy as np
import cv2
import pytest

from truely_tpu.cli import main


def test_analyze_cli(tmp_path, capsys, monkeypatch):
    path = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(8):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8), (9, 9)))
    writer.release()
    out = str(tmp_path / "out.mp4")

    rc = main(["analyze", path, "-o", out, "--batch", "4", "--compact"])
    assert rc == 0
    captured = capsys.readouterr()
    payload = json.loads(captured.out.strip().splitlines()[-1])
    assert 0 <= payload["fakeScore"] <= 100
    assert payload["frameCount"] == 8
    assert payload["outputPath"] == out
    assert "timings" in payload
    # seeded-weights warning went to stderr
    assert "seeded random weights" in captured.err


def test_cli_requires_command():
    with pytest.raises(SystemExit):
        main([])


def test_analyze_unreadable_input_is_clean_error(capsys):
    # Also exercises --pallas-crop arg parsing (falls back to the XLA path
    # off-TPU; the kernel itself is covered by tests/test_crop_pallas.py).
    rc = main(["analyze", "/nonexistent/clip.mp4", "--pallas-crop"])
    assert rc == 1
    captured = capsys.readouterr()
    assert "error: could not open video" in captured.err
    assert "Traceback" not in captured.err


def test_exact_pyramid_flag_builds_config(monkeypatch, capsys):
    """--exact-pyramid must reach MTCNNConfig.pyramid_cascade=False (the
    exact one-shot resample; PERFORMANCE.md finding 11)."""
    seen = {}

    class FakeDetector:
        facenet_pretrained = True

        def __init__(self, config, weights_dir=None, mesh=None):
            seen["config"] = config

        def analyze_video(self, video, output):
            raise IOError("stop here")

    import truely_tpu.pipeline.detector as det_mod
    monkeypatch.setattr(det_mod, "Detector", FakeDetector)
    rc = main(["analyze", __file__, "--exact-pyramid"])
    assert rc == 1  # the fake raises after config construction
    assert seen["config"].mtcnn.pyramid_cascade is False

    rc = main(["analyze", __file__])
    assert rc == 1
    assert seen["config"].mtcnn.pyramid_cascade is True


def test_crop_quant_flag_builds_config(monkeypatch, capsys):
    """--crop-quant must reach MTCNNConfig.stage_crop_quant (the quantized
    stage crops; 1 = exact full-resolution crops)."""
    seen = {}

    class FakeDetector:
        facenet_pretrained = True

        def __init__(self, config, weights_dir=None, mesh=None):
            seen["config"] = config

        def analyze_video(self, video, output):
            raise IOError("stop here")

    import truely_tpu.pipeline.detector as det_mod
    monkeypatch.setattr(det_mod, "Detector", FakeDetector)
    rc = main(["analyze", __file__, "--crop-quant", "1"])
    assert rc == 1  # the fake raises after config construction
    assert seen["config"].mtcnn.stage_crop_quant == 1

    rc = main(["analyze", __file__])
    assert rc == 1
    assert seen["config"].mtcnn.stage_crop_quant == 4


def test_dp_batch_divisibility_friendly_error(capsys):
    rc = main(["analyze", __file__, "--dp", "3"])  # default --batch 32
    assert rc == 1
    assert "divisible" in capsys.readouterr().err


def test_multi_face_flag_routes_to_track_analysis(monkeypatch, capsys):
    """--multi-face must set DetectorConfig.multi_face and print the
    per-track scores from analyze_video_multiface."""
    import numpy as np

    seen = {}

    class FakeDetector:
        facenet_pretrained = True

        def __init__(self, config, weights_dir=None, mesh=None):
            seen["config"] = config

        def analyze_video_multiface(self, video, output):
            return 77, np.asarray([77, 12, 0, 0]), None

        def analyze_video(self, video, output):
            raise AssertionError("single-face path must not run")

    import truely_tpu.pipeline.detector as det_mod
    monkeypatch.setattr(det_mod, "Detector", FakeDetector)
    rc = main(["analyze", __file__, "--multi-face", "--compact"])
    assert rc == 0
    assert seen["config"].multi_face is True
    import json as _json
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload == {"fakeScore": 77, "trackScores": [77, 12, 0, 0]}


def test_warmup_resolution_validated_at_parse_time():
    with pytest.raises(SystemExit):
        main(["serve", "--warmup", "1080p"])
    with pytest.raises(SystemExit):
        main(["serve", "--warmup", "0x640"])


def test_serve_flags_build_detector_factory(monkeypatch):
    """serve accepts the same detector knobs as analyze and plumbs them
    into the server's lazily-built detector via detector_factory."""
    seen = {}

    class FakeApp:
        def serve(self):
            pass

    def fake_create_app(config=None, detector_factory=None):
        seen["config"] = config
        seen["factory"] = detector_factory
        return FakeApp()

    class FakeDetector:
        def __init__(self, config, weights_dir=None, mesh=None):
            seen["det_config"] = config
            seen["weights_dir"] = weights_dir
            seen["mesh"] = mesh

    import truely_tpu.serve.app as app_mod
    import truely_tpu.pipeline.detector as det_mod
    monkeypatch.setattr(app_mod, "create_app", fake_create_app)
    monkeypatch.setattr(det_mod, "Detector", FakeDetector)

    rc = main(["serve", "--port", "5009", "--batch", "16", "--multi-face",
               "--crop-quant", "8", "--warmup", "64x96"])
    assert rc == 0
    assert seen["config"].port == 5009
    assert seen["config"].warmup_resolutions == ("64x96",)
    seen["factory"]()  # build the detector through the factory
    assert seen["det_config"].frame_batch == 16
    assert seen["det_config"].multi_face is True
    assert seen["det_config"].mtcnn.stage_crop_quant == 8
    assert seen["mesh"] is None


def test_serve_dp_batch_divisibility_error(capsys):
    rc = main(["serve", "--dp", "3", "--batch", "32"])
    assert rc == 1
    assert "divisible" in capsys.readouterr().err


def test_serve_detect_interval_plumbs_and_validates(monkeypatch, capsys):
    """--detect-interval reaches the server's detector config; the same
    guards as analyze apply (multi-face exclusivity, batch divisibility)."""
    seen = {}

    class FakeApp:
        def serve(self):
            pass

    def fake_create_app(config=None, detector_factory=None):
        seen["factory"] = detector_factory
        return FakeApp()

    class FakeDetector:
        def __init__(self, config, weights_dir=None, mesh=None):
            seen["det_config"] = config

    import truely_tpu.serve.app as app_mod
    import truely_tpu.pipeline.detector as det_mod
    monkeypatch.setattr(app_mod, "create_app", fake_create_app)
    monkeypatch.setattr(det_mod, "Detector", FakeDetector)

    rc = main(["serve", "--batch", "32", "--detect-interval", "4"])
    assert rc == 0
    seen["factory"]()
    assert seen["det_config"].detect_interval == 4

    rc = main(["serve", "--batch", "30", "--detect-interval", "4"])
    assert rc == 1
    assert "divisible" in capsys.readouterr().err

    # Multi-face + detect-interval compose (the track-propagated
    # multi-face path, round 4) — must construct, not be rejected.
    rc = main(["serve", "--multi-face", "--detect-interval", "4"])
    assert rc == 0
    seen["factory"]()
    assert seen["det_config"].detect_interval == 4
    assert seen["det_config"].multi_face
