"""API-contract tests: replay the JSON shapes/status codes of reference
server/server.py against our server, with a fake detector, fake agents, and
a fake acquisition module (SURVEY.md §4 test plan)."""

import json
import os
import subprocess
import threading
import time
import urllib.request

import pytest

from truely_tpu.config import ServerConfig
from truely_tpu.media.acquire import (
    AcquisitionError, CombinedDownload, get_platform_and_video_id,
    parse_quality, select_best_format, get_available_formats,
)
from truely_tpu.serve.app import TruelyServer
from truely_tpu.serve.http import Request, Response, make_server, serve_forever_in_thread
from truely_tpu.serve.results import ResultStore


class FakeDetector:
    def __init__(self, score=42):
        self.score = score
        self.calls = []

    def run(self, video_in, video_out):
        self.calls.append((video_in, video_out))
        with open(video_out, "wb") as f:
            f.write(b"fake-video-bytes")
        return self.score


class FakeAgents:
    def __init__(self, verdict="Fake", confidence=88, fail_query=False,
                 no_results=False):
        self.verdict = verdict
        self.confidence = confidence
        self.fail_query = fail_query
        self.no_results = no_results

    def transcribe_audio(self, path):
        return "the moon landing was faked yesterday says source"

    def generate_search_query(self, transcript, api_key):
        if self.fail_query:
            raise RuntimeError("gemini down")
        return "moon landing faked claim"

    def perform_search(self, query, api_key):
        if self.no_results:
            return []
        return [
            {"title": "Moon landing anniversary", "url": "https://bbc.com/a",
             "snippet": "...", "score": 0.9},
            {"title": "Fact check", "url": "https://cnn.com/b",
             "snippet": "...", "score": 0.8},
        ]

    def judge_content(self, transcript, sources, api_key):
        return {
            "verdict": self.verdict,
            "confidence": self.confidence,
            "reasoning": "Sources contradict the claim.",
            "sources": sources,
        }


class FakeAcquire:
    """Stands in for media.acquire inside the server."""

    AcquisitionError = AcquisitionError

    def __init__(self, tmp_path):
        self.tmp = tmp_path

    def _make(self, name, data=b"x" * 100):
        path = str(self.tmp / name)
        with open(path, "wb") as f:
            f.write(data)
        return path

    def download_video(self, url, quality, **kw):
        return self._make("video.mp4")

    def download_audio(self, url, fmt, **kw):
        return self._make(f"audio.{fmt}")

    def download_combined(self, url, fmt, quality, **kw):
        return CombinedDownload(
            video_path=self._make("combined.mp4"),
            audio_path=self._make(f"combined.{fmt}"),
        )


@pytest.fixture
def server(tmp_path):
    return TruelyServer(
        ServerConfig(),
        detector=FakeDetector(),
        agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path),
        store=ResultStore(),
        tavily_api_key="tvly-test",
        gemini_api_key="gm-test",
    )


def call(server, method, path, query=None, body=None, headers=None):
    req = Request(
        method=method, path=path, query=query or {},
        body=json.dumps(body).encode() if body is not None else b"",
        headers=headers or {},
    )
    resp = server.router.dispatch(req)
    payload = None
    if resp.content_type.startswith("application/json"):
        payload = json.loads(resp.content)
    return resp, payload


def make_video(tmp_path, name="in.mp4"):
    path = str(tmp_path / name)
    with open(path, "wb") as f:
        f.write(b"mp4data")
    return path


# ---- analyze-video ---------------------------------------------------------


def test_analyze_video_contract(server, tmp_path):
    path = make_video(tmp_path)
    resp, payload = call(server, "POST", "/analyze-video", body={"videoPath": path})
    assert resp.status == 200
    assert payload["fakeScore"] == 42
    rid = payload["resultId"]
    stored = server.store.get(rid)
    assert stored["fake_score"] == 42
    assert stored["output_path"].endswith("_output.mp4")
    # input deleted in background
    time.sleep(0.2)
    assert not os.path.exists(path)


@pytest.mark.parametrize("body,err", [
    ({}, "Missing video path"),
    ({"videoPath": "/nope/x.mp4"}, "Video file not found at specified path"),
])
def test_analyze_video_validation(server, body, err):
    resp, payload = call(server, "POST", "/analyze-video", body=body)
    assert resp.status == 400
    assert payload["error"] == err


def test_analyze_video_empty_file(server, tmp_path):
    path = str(tmp_path / "empty.mp4")
    open(path, "wb").close()
    resp, payload = call(server, "POST", "/analyze-video", body={"videoPath": path})
    assert resp.status == 400
    assert payload["error"] == "Video file is empty"


# ---- analyze-audio ---------------------------------------------------------


def test_analyze_audio_contract(server, tmp_path):
    path = make_video(tmp_path, "a.mp3")
    resp, payload = call(server, "POST", "/analyze-audio", body={"audioPath": path})
    assert resp.status == 200
    assert payload["newsScore"] == 88            # confidence wins over verdict map
    assert payload["verdict"] == "Fake"
    assert payload["confidence"] == 88
    assert len(payload["evidence"]) == 2
    assert payload["evidence"][0] == {
        "title": "Moon landing anniversary", "url": "https://bbc.com/a"
    }
    stored = server.store.get(payload["resultId"])
    assert stored["verdict"] == "Fake"


def test_analyze_audio_missing_keys_503(tmp_path):
    server = TruelyServer(
        detector=FakeDetector(), agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    path = make_video(tmp_path, "a.mp3")
    resp, payload = call(server, "POST", "/analyze-audio", body={"audioPath": path})
    assert resp.status == 503
    assert payload["error"] == "Gemini API key not configured"


def test_analyze_audio_no_results_uncertain(server, tmp_path):
    server.agents = FakeAgents(no_results=True)
    path = make_video(tmp_path, "a.mp3")
    resp, payload = call(server, "POST", "/analyze-audio", body={"audioPath": path})
    assert resp.status == 200
    assert payload["verdict"] == "Uncertain"
    assert payload["newsScore"] == 25


def test_analyze_audio_query_fallback(server, tmp_path):
    server.agents = FakeAgents(fail_query=True)
    path = make_video(tmp_path, "a.mp3")
    resp, payload = call(server, "POST", "/analyze-audio", body={"audioPath": path})
    assert resp.status == 200  # fell back to first-30-words query


# ---- analyze-combined ------------------------------------------------------


def test_analyze_combined_contract(server, tmp_path):
    video = make_video(tmp_path)
    audio = make_video(tmp_path, "a.mp3")
    resp, payload = call(
        server, "POST", "/analyze-combined",
        body={"videoPath": video, "audioPath": audio},
    )
    assert resp.status == 200
    assert payload["fakeScore"] == 42
    assert payload["newsScore"] == 88
    assert payload["verdict"] == "Fake"
    stored = server.store.get(payload["resultId"])
    assert stored["fake_score"] == 42
    assert stored["news_score"] == 88


def test_analyze_combined_video_only(server, tmp_path):
    video = make_video(tmp_path)
    resp, payload = call(server, "POST", "/analyze-combined", body={"videoPath": video})
    assert resp.status == 200
    assert payload["newsSummary"] == "No audio content provided for analysis"
    assert "verdict" not in payload


def test_analyze_combined_missing_keys_warns_not_503(tmp_path):
    server = TruelyServer(
        detector=FakeDetector(), agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    video = make_video(tmp_path)
    audio = make_video(tmp_path, "a.mp3")
    resp, payload = call(
        server, "POST", "/analyze-combined",
        body={"videoPath": video, "audioPath": audio},
    )
    assert resp.status == 200
    assert "Gemini API key not configured" in payload["newsSummary"]


# ---- downloads -------------------------------------------------------------


def test_download_video_contract(server):
    resp, payload = call(server, "GET", "/download-video",
                         query={"video_url": "https://youtube.com/watch?v=abc123"})
    assert resp.status == 200
    assert payload["videoPath"].endswith("video.mp4")


def test_download_video_no_url(server):
    resp, payload = call(server, "GET", "/download-video")
    assert resp.status == 400
    assert payload["error"] == "No video URL provided"


def test_download_audio_contract(server):
    resp, payload = call(server, "GET", "/download-audio",
                         query={"video_url": "https://youtu.be/abc", "format": "mp3"})
    assert resp.status == 200
    assert "resultId" in payload
    assert server.store.get(payload["resultId"])["audio_path"] == payload["audioPath"]


def test_download_combined_contract(server):
    resp, payload = call(server, "GET", "/download-combined",
                         query={"video_url": "https://youtu.be/abc"})
    assert resp.status == 200
    assert set(payload) == {"videoPath", "videoId", "audioPath", "audioId"}
    assert server.store.get(payload["videoId"])["output_path"] == payload["videoPath"]


# ---- view / media serving --------------------------------------------------


def test_view_and_video_roundtrip(server, tmp_path):
    video = make_video(tmp_path)
    audio = make_video(tmp_path, "a.mp3")
    _, payload = call(
        server, "POST", "/analyze-combined",
        body={"videoPath": video, "audioPath": audio},
    )
    rid = payload["resultId"]
    resp, _ = call(server, "GET", f"/view/{rid}")
    assert resp.status == 200
    html = resp.content.decode()
    assert "42" in html and "Fake" in html and "https://bbc.com/a" in html
    resp, _ = call(server, "GET", f"/video/{rid}")
    assert resp.status == 200
    assert resp.body_bytes() == b"fake-video-bytes"
    assert resp.content_type == "video/mp4"


def test_view_missing_404(server):
    resp, payload = call(server, "GET", "/view/deadbeef")
    assert resp.status == 404


def _view_html(server, result):
    rid = server.store.put(result)
    resp, _ = call(server, "GET", f"/view/{rid}")
    assert resp.status == 200
    return resp.content.decode()


# Report-page band parity with the reference template
# (reference view_result.html:891-918 consistency/anomaly bands,
# :923-943 alert copy, :981-991 credibility inversion, :1029-1053 sources).
@pytest.mark.parametrize("score,consistency,anomalies", [
    (90, "Very Low", "Very High"),
    (70, "Low", "High"),
    (50, "Medium", "Medium"),
    (30, "High", "Low"),
    (10, "Very High", "Very Low"),
])
def test_view_stat_bands(server, score, consistency, anomalies):
    html = _view_html(server, {"fake_score": score, "news_score": 0})
    ic = html.index("Facial Consistency")
    ia = html.index("Frame Anomalies")
    assert consistency in html[ic:ia]
    assert anomalies in html[ia:ia + 600]


@pytest.mark.parametrize("score,phrases", [
    (90, ["Very high AI detection", "signs of AI-generated edits"]),
    (65, ["High AI detection", "signs of AI-generated edits"]),
    (45, ["Moderate AI detection", "signs of AI-generated edits"]),
    (20, ["Low AI detection", "minimal signs of manipulation"]),
])
def test_view_alert_copy_bands(server, score, phrases):
    html = _view_html(server, {"fake_score": score, "news_score": 0})
    for phrase in phrases:
        assert phrase in html


def test_view_credibility_inversion(server):
    # Reference quirk (:983): displayed credibility = 100 - news_score
    # (the route never passes `confidence`, so the fallback at :981 always
    # takes news_score).
    html = _view_html(server, {"fake_score": 10, "news_score": 88,
                               "verdict": "Fake"})
    assert "12%" in html            # 100 - 88, the inverted ring value
    assert "88%" in html            # confidence stat card
    assert "Content Credibility" in html
    assert "Confidence Level" in html
    assert "Fact-Check Verdict" in html


def test_view_sources_snippet_fallback(server):
    # The route passes title/url only (matching reference server.py:126-131),
    # so the snippet fallback copy must render for every source (:1041-1045).
    html = _view_html(server, {
        "fake_score": 10, "news_score": 40, "verdict": "Misleading",
        "news_summary": "summary text here",
        "news_evidence": [{"title": "Src A", "url": "https://bbc.com/a"}],
    })
    assert "Referenced Sources" in html
    assert "Src A" in html and "https://bbc.com/a" in html
    assert "External source supporting the analysis" in html
    assert "Key Findings" in html and "summary text here" in html


def test_view_static_sections(server):
    html = _view_html(server, {"fake_score": 55, "news_score": 50})
    for section in ["How Truely Detects AI Content", "Face Detection",
                    "Fact Verification", "Interpreting Your Results",
                    "Media Literacy Tips", "Red Bounding Boxes",
                    "Green Bounding Boxes", "Verify Before You Believe"]:
        assert section in html


def test_view_no_fake_score_renders(server):
    # Audio-only results have no fake_score; the page must still render
    # (the reference template 500s on this input — guarded here).
    html = _view_html(server, {"news_score": 30, "verdict": "Uncertain",
                               "news_summary": "s"})
    assert "No video analysis available" in html
    assert "Content Credibility" in html and "70%" in html


# ---- Range / streamed file serving ------------------------------------------
# Reference behavior: FastAPI FileResponse (server/server.py:138-150) streams
# from disk and honors Range, which is what lets the report's <video> seek.


def _stored_video(server, tmp_path, data=b"0123456789abcdef"):
    path = str(tmp_path / "r.mp4")
    with open(path, "wb") as f:
        f.write(data)
    return server.store.put({"output_path": path}), data


def test_video_range_request_206(server, tmp_path):
    rid, data = _stored_video(server, tmp_path)
    resp, _ = call(server, "GET", f"/video/{rid}",
                   headers={"range": "bytes=4-7"})
    assert resp.status == 206
    assert resp.headers["Content-Range"] == f"bytes 4-7/{len(data)}"
    assert resp.body_bytes() == data[4:8]


def test_video_range_open_ended_and_suffix(server, tmp_path):
    rid, data = _stored_video(server, tmp_path)
    resp, _ = call(server, "GET", f"/video/{rid}",
                   headers={"range": "bytes=10-"})
    assert resp.status == 206 and resp.body_bytes() == data[10:]
    resp, _ = call(server, "GET", f"/video/{rid}",
                   headers={"range": "bytes=-4"})
    assert resp.status == 206 and resp.body_bytes() == data[-4:]


def test_video_range_unsatisfiable_416(server, tmp_path):
    rid, data = _stored_video(server, tmp_path)
    resp, _ = call(server, "GET", f"/video/{rid}",
                   headers={"range": f"bytes={len(data)}-"})
    assert resp.status == 416
    assert resp.headers["Content-Range"] == f"bytes */{len(data)}"


def test_video_full_response_advertises_ranges(server, tmp_path):
    rid, data = _stored_video(server, tmp_path)
    resp, _ = call(server, "GET", f"/video/{rid}")
    assert resp.status == 200
    assert resp.headers["Accept-Ranges"] == "bytes"
    assert resp.body_bytes() == data


def test_parse_byte_range_units():
    from truely_tpu.serve.http import parse_byte_range

    assert parse_byte_range("bytes=0-0", 10) == (0, 0)
    assert parse_byte_range("bytes=3-100", 10) == (3, 9)   # end clamped
    assert parse_byte_range("bytes=3-", 10) == (3, 9)
    assert parse_byte_range("bytes=-3", 10) == (7, 9)
    assert parse_byte_range("bytes=-0", 10) is None
    assert parse_byte_range("bytes=10-", 10) is None        # past EOF
    assert parse_byte_range("bytes=5-4", 10) is None
    assert parse_byte_range("bytes=-", 10) is None
    assert parse_byte_range("bogus", 10) is None
    assert parse_byte_range("bytes=0-", 0) is None


def test_range_over_real_socket(server, tmp_path):
    """The wire-level handler must stream the ranged bytes with 206."""
    rid, data = _stored_video(server, tmp_path)
    httpd = make_server(server.router, "127.0.0.1", 0)
    serve_forever_in_thread(httpd)
    try:
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/video/{rid}",
            headers={"Range": "bytes=2-5"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 206
            assert r.headers["Content-Range"] == f"bytes 2-5/{len(data)}"
            assert r.read() == data[2:6]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/video/{rid}"
        ) as r:
            assert r.status == 200
            assert r.read() == data
    finally:
        httpd.shutdown()


def test_oversized_body_rejected_413(server, tmp_path):
    from truely_tpu.serve import http as http_mod

    httpd = make_server(server.router, "127.0.0.1", 0)
    serve_forever_in_thread(httpd)
    old = http_mod.MAX_BODY_BYTES
    http_mod.MAX_BODY_BYTES = 1024
    try:
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-video",
            data=b"x" * 2048, method="POST",
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        http_mod.MAX_BODY_BYTES = old
        httpd.shutdown()


def test_audio_media_types(server, tmp_path):
    for ext, expected in [("m4a", "audio/mp4"), ("mp3", "audio/mp3")]:
        path = make_video(tmp_path, f"x.{ext}")
        rid = server.store.put({"audio_path": path})
        resp, _ = call(server, "GET", f"/audio/{rid}")
        assert resp.status == 200
        assert resp.content_type == expected


def test_static_and_health(server):
    resp, _ = call(server, "GET", "/static/icon16.png")
    assert resp.status == 200
    assert resp.content_type == "image/png"
    resp, payload = call(server, "GET", "/health")
    assert payload["status"] == "ok"


class FailingDetector:
    def run(self, video_in, video_out):
        raise RuntimeError("injected device failure")


def test_analysis_fault_surfaces_500_and_metrics(tmp_path):
    server = TruelyServer(
        detector=FailingDetector(), agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    path = make_video(tmp_path)
    resp, payload = call(server, "POST", "/analyze-video", body={"videoPath": path})
    assert resp.status == 500
    assert "injected device failure" in payload["error"]
    _, metrics = call(server, "GET", "/metrics")
    assert metrics["analyses_total"] == 1
    assert metrics["analyses_failed"] == 1


def test_metrics_endpoint(server, tmp_path):
    resp, payload = call(server, "GET", "/metrics")
    assert resp.status == 200
    assert payload["analyses_total"] == 0
    path = make_video(tmp_path)
    call(server, "POST", "/analyze-video", body={"videoPath": path})
    call(server, "GET", "/download-video",
         query={"video_url": "https://youtu.be/abc"})
    resp, payload = call(server, "GET", "/metrics")
    assert payload["analyses_total"] == 1
    assert payload["analyses_failed"] == 0
    assert payload["downloads_total"] == 1
    assert payload["last_analysis_seconds"] is not None
    assert payload["uptime_seconds"] >= 0


def test_invalid_json_body(server):
    req = Request(method="POST", path="/analyze-video", query={}, body=b"{not json")
    resp = server.router.dispatch(req)
    assert resp.status == 400


def test_unknown_route_404(server):
    resp, payload = call(server, "GET", "/no-such-endpoint")
    assert resp.status == 404


def test_cors_preflight_over_socket(server):
    httpd = make_server(server.router, "127.0.0.1", 0)
    port = httpd.server_address[1]
    serve_forever_in_thread(httpd)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-video", method="OPTIONS"
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 204
            assert r.headers["Access-Control-Allow-Origin"] == "*"
            assert r.headers["Access-Control-Allow-Methods"] == "*"
    finally:
        httpd.shutdown()


def test_async_job_lifecycle(server, tmp_path):
    path = make_video(tmp_path)
    resp, payload = call(server, "POST", "/jobs/analyze-video",
                         body={"videoPath": path})
    assert resp.status == 202
    job_id = payload["jobId"]
    job = server.jobs.wait(job_id, timeout=30)
    assert job.status == "done"
    resp, payload = call(server, "GET", f"/jobs/{job_id}")
    assert resp.status == 200
    assert payload["status"] == "done"
    assert payload["fakeScore"] == 42
    assert "resultId" in payload
    # result visible through the normal store-backed endpoints
    resp, _ = call(server, "GET", f"/video/{payload['resultId']}")
    assert resp.status == 200


def test_async_job_validation_is_synchronous(server):
    resp, payload = call(server, "POST", "/jobs/analyze-video",
                         body={"videoPath": "/nope.mp4"})
    assert resp.status == 400


def test_async_job_failure_reported(tmp_path):
    server = TruelyServer(
        detector=FailingDetector(), agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    path = make_video(tmp_path)
    resp, payload = call(server, "POST", "/jobs/analyze-video",
                         body={"videoPath": path})
    job = server.jobs.wait(payload["jobId"], timeout=30)
    assert job.status == "failed"
    resp, payload = call(server, "GET", f"/jobs/{job.job_id}")
    assert payload["status"] == "failed"
    assert "injected device failure" in payload["error"]


def test_async_job_unknown_404(server):
    resp, _ = call(server, "GET", "/jobs/deadbeef")
    assert resp.status == 404


# ---- result store ----------------------------------------------------------


def test_result_store_ttl_and_file_cleanup(tmp_path):
    now = [1000.0]
    store = ResultStore(ttl_seconds=10, clock=lambda: now[0])
    media = make_video(tmp_path, "old.mp4")
    rid = store.put({"output_path": media})
    assert store.sweep() == 0
    now[0] += 11
    assert store.sweep() == 1
    assert store.get(rid) is None
    assert not os.path.exists(media)


def test_result_store_persistence_across_restart(tmp_path):
    snap = str(tmp_path / "results.json")
    now = [1000.0]
    store = ResultStore(ttl_seconds=100, clock=lambda: now[0], persist_path=snap)
    rid_fresh = store.put({"fake_score": 42})
    now[0] = 1050.0
    rid_old = store.put({"fake_score": 7}, result_id="old")
    # simulate restart 80s later: 'old' is 30s old (fresh), rid_fresh is 130s (expired)
    now[0] = 1130.0
    store2 = ResultStore(ttl_seconds=100, clock=lambda: now[0], persist_path=snap)
    assert store2.get(rid_old) is not None
    assert store2.get(rid_fresh) is None


def test_result_store_concurrent_access():
    store = ResultStore(ttl_seconds=0.001)
    errors = []

    def writer():
        try:
            for _ in range(300):
                store.put({"x": 1})
        except Exception as e:
            errors.append(e)

    def sweeper():
        try:
            for _ in range(300):
                store.sweep()
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer) for _ in range(4)] + [
        threading.Thread(target=sweeper) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


# ---- real socket smoke test ------------------------------------------------


def test_http_server_over_socket(server):
    httpd = make_server(server.router, "127.0.0.1", 0)
    port = httpd.server_address[1]
    serve_forever_in_thread(httpd)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.status == 200
            assert json.loads(r.read())["status"] == "ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/analyze-video",
            data=json.dumps({"videoPath": "/nope.mp4"}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert e.headers["Access-Control-Allow-Origin"] == "*"
    finally:
        httpd.shutdown()


# ---- acquisition unit tests ------------------------------------------------


def test_platform_regexes():
    cases = [
        ("https://www.youtube.com/watch?v=dQw4w9WgXcQ", ("youtube", "dQw4w9WgXcQ")),
        ("https://youtu.be/abc_123", ("youtube", "abc_123")),
        ("https://www.youtube.com/shorts/xyz", ("youtube", "xyz")),
        ("https://x.com/user/status/12345", ("twitter", "12345")),
        ("https://twitter.com/user/status/678", ("twitter", "678")),
        ("https://www.facebook.com/watch/?v=555", ("facebook", "555")),
        ("https://fb.watch/abcde/", ("facebook", "abcde")),
        ("https://www.facebook.com/page/videos/999", ("facebook", "999")),
        ("https://www.reddit.com/r/videos/comments/xyz9/title/", ("reddit", "xyz9")),
        ("https://redd.it/abc12", ("reddit", "abc12")),
        ("https://example.com/video/1", (None, None)),
    ]
    for url, expected in cases:
        assert get_platform_and_video_id(url) == expected, url


def test_parse_quality():
    assert parse_quality("720p") == 720
    assert parse_quality("1080P") == 1080
    assert parse_quality("garbage") == 360
    assert parse_quality(None) == 360
    assert parse_quality("-5p") == 360


def test_select_best_format():
    formats = [
        {"format_id": "a", "height": 1080, "vcodec": "h264"},
        {"format_id": "b", "height": 360, "vcodec": "h264"},
        {"format_id": "c", "height": 240, "vcodec": "h264"},
        {"format_id": "d", "height": 720, "vcodec": "none"},   # audio-only-ish
        {"format_id": "e", "vcodec": "h264"},                  # no height
    ]
    assert select_best_format(formats, 360) == "b"
    assert select_best_format(formats, 100) == "c"   # all above target -> smallest
    assert select_best_format([], 360) is None


def test_download_video_with_fake_runner(tmp_path, monkeypatch):
    from truely_tpu.media import acquire as acq

    created = {}

    def runner(cmd, timeout):
        # yt-dlp invocation shape: flags ... -f <fmt> --merge-output-format
        # mp4 -o <path> <url>
        assert cmd[0] == "yt-dlp"
        out = cmd[cmd.index("-o") + 1]
        with open(out, "wb") as f:
            f.write(b"video-bytes")
        created["path"] = out
        created["fmt"] = cmd[cmd.index("-f") + 1]
        return subprocess.CompletedProcess(cmd, 0, stdout="", stderr="")

    path = acq.download_video(
        "https://youtu.be/abc", "720p", runner=runner, validate=lambda p: True
    )
    assert path == created["path"]
    assert created["fmt"] == "best[height<=720]"
    assert os.path.exists(path)
    os.unlink(path)


def test_download_video_timeout_maps_to_504():
    from truely_tpu.media import acquire as acq

    def runner(cmd, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    with pytest.raises(AcquisitionError) as exc:
        acq.download_video("https://youtu.be/abc", runner=runner)
    assert exc.value.status == 504


def test_download_combined_audio_failure_degrades(tmp_path):
    from truely_tpu.media import acquire as acq

    def runner(cmd, timeout):
        out = cmd[cmd.index("-o") + 1]
        if "-x" in cmd:  # audio leg fails
            raise subprocess.CalledProcessError(1, cmd, stderr="no audio")
        with open(out, "wb") as f:
            f.write(b"video-bytes")
        return subprocess.CompletedProcess(cmd, 0, stdout="", stderr="")

    dl = acq.download_combined("https://youtu.be/abc", runner=runner)
    assert dl.video_path and os.path.exists(dl.video_path)
    assert dl.audio_path is None
    os.unlink(dl.video_path)


def test_download_audio_format_fallback(tmp_path):
    from truely_tpu.media import acquire as acq

    seen = {}

    def runner(cmd, timeout):
        out = cmd[cmd.index("-o") + 1]
        seen["fmt"] = cmd[cmd.index("--audio-format") + 1]
        with open(out, "wb") as f:
            f.write(b"audio")
        return subprocess.CompletedProcess(cmd, 0, stdout="", stderr="")

    path = acq.download_audio("https://youtu.be/abc", "weird", runner=runner)
    assert seen["fmt"] == "mp3"  # unsupported format falls back
    assert path.endswith(".mp3")
    os.unlink(path)


def test_get_available_formats_with_fake_runner():
    def runner(cmd, timeout):
        assert cmd[:2] == ["yt-dlp", "--dump-json"]
        return subprocess.CompletedProcess(
            cmd, 0, stdout=json.dumps({"formats": [{"format_id": "f1"}]}), stderr="")

    assert get_available_formats("https://youtu.be/x", runner=runner) == [
        {"format_id": "f1"}
    ]
    # probe failure degrades to empty list
    def bad_runner(cmd, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    assert get_available_formats("https://youtu.be/x", runner=bad_runner) == []


def test_analyze_video_never_touches_unmanaged_inputs(server, tmp_path, monkeypatch):
    """A caller-supplied videoPath OUTSIDE the server's media (temp) dir must
    be analyzed but NEVER deleted, and the annotated output must land in the
    media dir, not next to the input.  (The reference deletes its input and
    writes beside it — correct only for its own downloads; pointed at a
    read-only fixture it destroys it.)"""
    import tempfile

    managed = tmp_path / "managed"
    managed.mkdir()
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(managed))
    path = make_video(tmp_path, "fixture.mp4")  # outside the managed dir
    resp, payload = call(server, "POST", "/analyze-video",
                         body={"videoPath": path})
    assert resp.status == 200
    stored = server.store.get(payload["resultId"])
    assert stored["output_path"].startswith(str(managed))
    time.sleep(0.3)
    assert os.path.exists(path), "unmanaged input must not be deleted"
    assert not os.path.exists(path.replace(".mp4", "_output.mp4"))


def test_analyze_video_managed_inputs_keep_reference_behavior(server, tmp_path, monkeypatch):
    """Inputs inside the media dir keep the reference contract: output next
    to the input, input deleted afterwards."""
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    path = make_video(tmp_path, "dl.mp4")
    resp, payload = call(server, "POST", "/analyze-video",
                         body={"videoPath": path})
    assert resp.status == 200
    stored = server.store.get(payload["resultId"])
    assert stored["output_path"] == path.replace(".mp4", "_output.mp4")
    time.sleep(0.3)
    assert not os.path.exists(path)


def test_warmup_precompiles_and_reports_in_health(tmp_path):
    """warmup_resolutions pre-compiles buckets on a background thread at
    construction and /health reports requested/done progress."""
    import time as _time

    calls = []

    class WarmDetector(FakeDetector):
        facenet_pretrained = True

        def warmup(self, h, w):
            calls.append((h, w))

    srv = TruelyServer(
        ServerConfig(warmup_resolutions=("360x640", "1080x1920")),
        detector=WarmDetector(),
        agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path),
        store=ResultStore(),
    )
    deadline = _time.time() + 10
    while len(srv._warmed) < 2 and _time.time() < deadline:
        _time.sleep(0.02)
    assert calls == [(360, 640), (1080, 1920)]
    _, payload = call(srv, "GET", "/health")
    assert payload["warmup"]["requested"] == ["360x640", "1080x1920"]
    assert payload["warmup"]["done"] == ["360x640", "1080x1920"]


def test_warmup_bad_entry_is_best_effort(tmp_path):
    import time as _time

    class WarmDetector(FakeDetector):
        def warmup(self, h, w):
            pass

    srv = TruelyServer(
        ServerConfig(warmup_resolutions=("garbage", "64X96", "64x96")),
        detector=WarmDetector(),
        agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path),
        store=ResultStore(),
    )
    deadline = _time.time() + 10
    while len(srv._warmed) < 2 and _time.time() < deadline:
        _time.sleep(0.02)
    # done entries keep the REQUESTED spelling so clients can compare
    # done against requested verbatim; duplicate spellings of one bucket
    # all land in done (compiled once).
    assert srv._warmed == ["64X96", "64x96"]


# ---- concurrent job batching (StreamScheduler group runner) -----------------


def _make_real_video(tmp_path, name, n=24, w=96, h=64, fps=10):
    import cv2
    import numpy as np

    path = str(tmp_path / name)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert writer.isOpened()
    rng = np.random.default_rng(7)
    for _ in range(n):
        writer.write(cv2.blur(
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8), (9, 9)
        ))
    writer.release()
    return path


def test_concurrent_jobs_share_device_batches(tmp_path):
    """N same-resolution /jobs/analyze-video submissions are dequeued as
    ONE group and scored in shared device batches (the reference would run
    them strictly one at a time, server/server.py:611): with batch >= the
    group's total sampled frames, the whole group costs ONE device step
    instead of N, each job's score equals its solo analysis, the annotated
    outputs serve over /video, and /metrics exposes latency percentiles."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    cfg = DetectorConfig(
        frame_batch=96, compute_dtype="float32", yuv_ingest=False,
        mtcnn=MTCNNConfig(
            pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
            thresholds=(0.5, 0.3, 0.2),  # random weights: permissive
        ),
    )
    det = Detector(cfg)
    paths = [_make_real_video(tmp_path, f"v{i}.mp4") for i in range(3)]
    # Solo baseline first (group jobs delete their inputs afterwards).
    solo = det.analyze_video(paths[0])

    step_batches = []
    real_step = det.step_device

    def counting_step(frames):
        step_batches.append(int(frames.shape[0]))
        return real_step(frames)

    det.step_device = counting_step

    server = TruelyServer(
        detector=det, agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    # Hold the single worker on a gate job so all three submissions are
    # queued together, then release: they must dequeue as one group.
    gate = threading.Event()
    server.jobs.submit("gate", lambda: gate.wait(30) and {})
    job_ids = []
    for p in paths:
        resp, payload = call(server, "POST", "/jobs/analyze-video",
                             body={"videoPath": p})
        assert resp.status == 202
        job_ids.append(payload["jobId"])
    gate.set()

    jobs = [server.jobs.wait(j, timeout=300) for j in job_ids]
    assert [j.status for j in jobs] == ["done", "done", "done"]
    # One group: identical start/finish stamps across the three jobs.
    assert len({j.started_at for j in jobs}) == 1
    assert len({j.finished_at for j in jobs}) == 1
    # ONE shared device step scored all three videos (3 x 24 sampled
    # frames <= one 96-frame batch) — that is the whole point.
    assert len(step_batches) == 1, step_batches
    # Decisions equal solo analysis (identical content in all three).
    for j in jobs:
        assert j.result["fakeScore"] == solo.fake_score
        resp, _ = call(server, "GET", f"/video/{j.result['resultId']}")
        assert resp.status == 200
    # Inputs deleted per the reference contract (async, allow a moment).
    deadline = time.time() + 10
    while any(os.path.exists(p) for p in paths) and time.time() < deadline:
        time.sleep(0.02)
    assert not any(os.path.exists(p) for p in paths)
    # The BASELINE north-star metric: latency percentiles on /metrics.
    resp, metrics = call(server, "GET", "/metrics")
    assert metrics["analyses_total"] == 3
    assert metrics["analysis_seconds_p50"] > 0
    assert metrics["analysis_seconds_p95"] >= metrics["analysis_seconds_p50"]
    # Queue-wait vs run split: all three jobs waited behind the gate job
    # (wait reflects queue policy, > 0), while the run each recorded is
    # the ONE shared group pass — so total run-seconds across the group
    # is the group wall, not 3x a solo analysis (run <= the combined
    # latency window that includes the waits).
    assert metrics["job_wait_seconds_p50"] > 0
    assert metrics["job_run_seconds_p50"] > 0
    assert metrics["job_run_seconds_p50"] <= metrics["analysis_seconds_p95"]
    group_wall = jobs[0].finished_at - jobs[0].started_at
    assert metrics["job_run_seconds_p95"] <= group_wall + 0.5


def test_single_job_keeps_solo_contract(tmp_path):
    """A lone groupable job (real video, batch_key set) still runs the
    synchronous handler path — full contract, no scheduler involved."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    det = Detector(DetectorConfig(
        frame_batch=8, compute_dtype="float32", yuv_ingest=False,
        mtcnn=MTCNNConfig(pnet_topk_total=64, rnet_capacity=16,
                          onet_capacity=8, thresholds=(0.5, 0.3, 0.2)),
    ))
    server = TruelyServer(
        detector=det, agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    path = _make_real_video(tmp_path, "solo.mp4")
    resp, payload = call(server, "POST", "/jobs/analyze-video",
                         body={"videoPath": path})
    assert resp.status == 202
    job = server.jobs.wait(payload["jobId"], timeout=300)
    assert job.status == "done"
    assert job.batch_key is not None  # probed, groupable — just alone
    assert "resultId" in job.result
    resp, _ = call(server, "GET", f"/video/{job.result['resultId']}")
    assert resp.status == 200


def test_concurrent_multiface_jobs_share_device_batches(tmp_path):
    """A multi-face server batches concurrent jobs too (round-4 gap: it
    used to fall back to serialized solo analyses): N same-resolution
    submissions dequeue as ONE group, score in shared multi-face device
    batches, and each job's aggregate + per-track scores equal its solo
    analyze_video_multiface run."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    cfg = DetectorConfig(
        frame_batch=96, compute_dtype="float32", yuv_ingest=False,
        multi_face=True, max_tracks=3,
        mtcnn=MTCNNConfig(
            pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
            thresholds=(0.5, 0.3, 0.2),  # random weights: permissive
        ),
    )
    det = Detector(cfg)
    paths = [_make_real_video(tmp_path, f"m{i}.mp4") for i in range(3)]
    # Solo baseline first (group jobs delete their inputs afterwards).
    solo_score, solo_tracks, _ = det.analyze_video_multiface(paths[0])

    mstep_batches = []
    det._ensure_track_jits()
    real_mstep = det._mstep

    def counting_mstep(params, frames):
        mstep_batches.append(int(frames.shape[0]))
        return real_mstep(params, frames)

    det._mstep = counting_mstep

    server = TruelyServer(
        detector=det, agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    gate = threading.Event()
    server.jobs.submit("gate", lambda: gate.wait(30) and {})
    job_ids = []
    for p in paths:
        resp, payload = call(server, "POST", "/jobs/analyze-video",
                             body={"videoPath": p})
        assert resp.status == 202
        job_ids.append(payload["jobId"])
    gate.set()

    jobs = [server.jobs.wait(j, timeout=300) for j in job_ids]
    assert [j.status for j in jobs] == ["done", "done", "done"]
    # One group (shared start/finish stamps), ONE multi-face device step
    # for all three videos (3 x 24 sampled frames <= one 96-frame batch).
    assert len({j.started_at for j in jobs}) == 1
    assert len(mstep_batches) == 1, mstep_batches
    for j in jobs:
        assert j.result["fakeScore"] == solo_score
        assert j.result["trackScores"] == [int(v) for v in solo_tracks]
        resp, _ = call(server, "GET", f"/video/{j.result['resultId']}")
        assert resp.status == 200


def test_multiface_auto_server_groups_jobs_via_degrade(tmp_path):
    """A multi-face server with detect_interval="auto" (round 5): the solo
    analyze paths ladder, but the grouped-jobs path wraps a
    StreamScheduler whose multi-face auto cadence DEGRADES to full
    detection every step — the group must complete (no mid-job
    ValueError, the pre-degrade behavior) and each job's scores must
    equal a solo FULL-mode multi-face analysis (the scheduler's
    exactness-vs-solo-full contract)."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    mt = MTCNNConfig(
        pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
        thresholds=(0.5, 0.3, 0.2),
    )
    cfg = DetectorConfig(
        frame_batch=96, compute_dtype="float32", yuv_ingest=False,
        multi_face=True, max_tracks=3, detect_interval="auto",
        auto_interval_max=4, mtcnn=mt,
    )
    det = Detector(cfg)
    cfg_full = DetectorConfig(
        frame_batch=96, compute_dtype="float32", yuv_ingest=False,
        multi_face=True, max_tracks=3, mtcnn=mt,
    )
    det_full = Detector(cfg_full)
    det_full.params = det.params
    paths = [_make_real_video(tmp_path, f"a{i}.mp4") for i in range(2)]
    solo_score, solo_tracks, _ = det_full.analyze_video_multiface(paths[0])

    server = TruelyServer(
        detector=det, agents=FakeAgents(),
        acquire_module=FakeAcquire(tmp_path), store=ResultStore(),
        tavily_api_key="", gemini_api_key="",
    )
    gate = threading.Event()
    server.jobs.submit("gate", lambda: gate.wait(30) and {})
    job_ids = []
    for p in paths:
        resp, payload = call(server, "POST", "/jobs/analyze-video",
                             body={"videoPath": p})
        assert resp.status == 202
        job_ids.append(payload["jobId"])
    gate.set()

    jobs = [server.jobs.wait(j, timeout=300) for j in job_ids]
    assert [j.status for j in jobs] == ["done", "done"]
    for j in jobs:
        assert j.result["fakeScore"] == solo_score
        assert j.result["trackScores"] == [int(v) for v in solo_tracks]
