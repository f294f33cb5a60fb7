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


# ---------------------------------------------------------------------------
# Raw-socket robustness (bugs the JSON-level tests can't see)
# ---------------------------------------------------------------------------


def _raw_server(handler_map):
    """Start a real socket server with explicit routes; returns (srv, port)."""
    from truely_tpu.serve.http import Router, make_server, serve_forever_in_thread

    router = Router()
    for (method, pattern), fn in handler_map.items():
        router.add(method, pattern, fn)
    srv = make_server(router, "127.0.0.1", 0)
    serve_forever_in_thread(srv)
    return srv, srv.server_address[1]


def test_negative_content_length_does_not_hang():
    """Content-Length: -5 must be treated as 0, not rfile.read(-5) (which
    reads to EOF and parks the handler thread + semaphore slot until the
    client disconnects)."""
    import socket

    from truely_tpu.serve.http import Response

    srv, port = _raw_server({
        ("POST", "/echo"): lambda req: Response.json({"n": len(req.body)}),
    })
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.settimeout(5)
            s.sendall(b"POST /echo HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: -5\r\n\r\n")
            data = b""
            while b'{"n": 0}' not in data:  # times out if the thread hung
                chunk = s.recv(65536)
                if not chunk:
                    break
                data += chunk
        assert b"200" in data.split(b"\r\n", 1)[0]
        assert b'{"n": 0}' in data
    finally:
        srv.shutdown()


def test_file_vanishing_mid_stream_keeps_server_alive(tmp_path):
    """The TTL sweep can delete a video between Response.file() and the
    streaming loop; the handler must log-and-drop, not kill the thread's
    ability to serve the next request."""
    import os
    import urllib.request as _rq

    from truely_tpu.serve.http import Response

    path = str(tmp_path / "gone.bin")
    with open(path, "wb") as f:
        f.write(b"x" * 1024)

    def handler(req):
        resp = Response.file(path)
        os.remove(path)          # simulate the sweep racing the stream
        return resp

    srv, port = _raw_server({
        ("GET", "/gone"): handler,
        ("GET", "/ok"): lambda req: Response.json({"ok": True}),
    })
    try:
        try:
            _rq.urlopen(f"http://127.0.0.1:{port}/gone", timeout=5).read()
        except Exception:
            pass  # truncated/dropped response is the expected outcome
        out = json.load(_rq.urlopen(f"http://127.0.0.1:{port}/ok", timeout=5))
        assert out == {"ok": True}
    finally:
        srv.shutdown()
