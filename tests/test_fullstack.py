"""Full-stack integration: a real Detector (tiny config) behind the real
HTTP server over a real socket — the closest offline analogue of the
reference's manual README walkthrough (SURVEY.md §4)."""

import json
import urllib.request

import numpy as np
import cv2
import pytest

from truely_tpu.config import DetectorConfig, MTCNNConfig, ServerConfig
from truely_tpu.pipeline.detector import Detector
from truely_tpu.serve.app import TruelyServer
from truely_tpu.serve.http import make_server, serve_forever_in_thread
from truely_tpu.serve.results import ResultStore


class NoNewsAgents:
    def transcribe_audio(self, path):
        raise RuntimeError("no network in tests")


@pytest.fixture(scope="module")
def detector():
    return Detector(
        DetectorConfig(
            frame_batch=8, compute_dtype="float32",
            mtcnn=MTCNNConfig(
                pnet_topk_total=16,
                rnet_capacity=8, onet_capacity=4, thresholds=(0.5, 0.3, 0.2),
            ),
        )
    )


def test_analyze_video_over_socket(tmp_path, detector):
    video = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(12):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8), (9, 9)))
    writer.release()

    app = TruelyServer(
        ServerConfig(), detector=detector, agents=NoNewsAgents(),
        store=ResultStore(), tavily_api_key="", gemini_api_key="",
    )
    httpd = make_server(app.router, "127.0.0.1", 0)
    port = httpd.server_address[1]
    serve_forever_in_thread(httpd)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-video",
            data=json.dumps({"videoPath": video}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        assert 0 <= payload["fakeScore"] <= 100
        rid = payload["resultId"]

        # Annotated video is served back.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/video/{rid}", timeout=60
        ) as r:
            data = r.read()
        assert len(data) > 0
        assert r.headers["Content-Type"] == "video/mp4"
        out = tmp_path / "served.mp4"
        out.write_bytes(data)
        cap = cv2.VideoCapture(str(out))
        assert cap.isOpened()
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 12

        # Report renders with the real score.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/view/{rid}", timeout=60
        ) as r:
            html = r.read().decode()
        assert str(payload["fakeScore"]) in html

        # Metrics saw the analysis.
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=60
        ) as r:
            metrics = json.loads(r.read())
        assert metrics["analyses_total"] == 1
    finally:
        httpd.shutdown()


def test_corrected_mode_end_to_end(tmp_path):
    """reference_compat=False (RGB + standardization) runs end to end and
    writes a decodable output with the right colors."""
    det = Detector(
        DetectorConfig(
            frame_batch=4, compute_dtype="float32", reference_compat=False,
            mtcnn=MTCNNConfig(
                pnet_topk_total=16,
                rnet_capacity=8, onet_capacity=4, thresholds=(0.5, 0.3, 0.2),
            ),
        )
    )
    video = str(tmp_path / "color.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    # Solid blue frames (BGR = 255,0,0): if the corrected path mishandles
    # channel order, the re-encoded video comes out red.
    frame = np.zeros((64, 96, 3), np.uint8)
    frame[..., 0] = 255
    for _ in range(6):
        writer.write(frame)
    writer.release()

    out = str(tmp_path / "out.mp4")
    res = det.analyze_video(video, out)
    assert res.frame_count == 6
    cap = cv2.VideoCapture(out)
    ok, decoded = cap.read()
    cap.release()
    assert ok
    # blue channel dominant in the BGR-decoded output
    assert decoded[..., 0].mean() > 150
    assert decoded[..., 2].mean() < 100


def test_odd_resolution_bucket(detector):
    """A non-standard resolution compiles its own bucket and runs."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (5, 57, 111, 3), dtype=np.uint8)
    res = detector.analyze_frames(frames, fps=10)
    assert res.total_processed == 5
