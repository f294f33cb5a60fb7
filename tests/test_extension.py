"""Contract tests for the browser extension (SURVEY.md §2.1 #9-14).

The reference ships the extension with zero tests AND with stale endpoints —
its service worker calls `/download` and `/analyze`, which do not exist on
its own server (reference extension/background.js:111,145,163 vs
server/server.py routes).  These tests pin the contract so that class of rot
cannot recur: every URL the service worker fetches must resolve against the
server's route table, every `action` the UI sends must have a worker handler,
and both sides must agree on which platform URLs are valid.

No node/jsdom in the image, so the JS is checked statically (regex over
source) against the live Python side.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from truely_tpu.media import acquire

EXT_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "extension")
APP_PY = os.path.join(
    os.path.dirname(__file__), os.pardir, "truely_tpu", "serve", "app.py"
)


def _read(name: str) -> str:
    with open(os.path.join(EXT_DIR, name), encoding="utf-8") as f:
        return f.read()


def _server_routes():
    """(method, pattern) pairs statically parsed from app._build_router."""
    src = open(APP_PY, encoding="utf-8").read()
    routes = re.findall(r'r\.add\(\s*"(GET|POST)",\s*"([^"]+)"', src)
    assert routes, "route table not found in serve/app.py"
    return routes


def _route_matches(method: str, path: str) -> bool:
    for m, pattern in _server_routes():
        if m != method:
            continue
        regex = re.sub(r"\{(\w+)\}", r"[^/]+", pattern)
        if re.fullmatch(regex, path):
            return True
    return False


# ---------------------------------------------------------------------------
# manifest
# ---------------------------------------------------------------------------


def test_manifest_shape_and_referenced_files_exist():
    manifest = json.loads(_read("manifest.json"))
    assert manifest["manifest_version"] == 3
    for perm in ("activeTab", "storage", "downloads", "tabs"):
        assert perm in manifest["permissions"], perm
    assert any(
        "localhost:5001" in h for h in manifest["host_permissions"]
    ), "extension must be allowed to reach the local analysis server"

    referenced = [manifest["action"]["default_popup"]]
    referenced += [manifest["background"]["service_worker"]]
    for cs in manifest.get("content_scripts", []):
        referenced += cs["js"]
    for icon in manifest.get("icons", {}).values():
        referenced.append(icon)
    for name in referenced:
        assert os.path.exists(os.path.join(EXT_DIR, name)), name


def test_manifest_covers_all_supported_platforms():
    manifest = _read("manifest.json")
    for domain in ("youtube.com", "x.com", "facebook.com", "reddit.com"):
        assert domain in manifest, f"content-script/host coverage missing {domain}"


def test_html_asset_references_exist():
    for page in ("popup.html", "auth.html"):
        html = _read(page)
        for ref in re.findall(r'(?:src|href)="([^"#][^":]*)"', html):
            assert os.path.exists(os.path.join(EXT_DIR, ref)), f"{page} -> {ref}"


# ---------------------------------------------------------------------------
# service worker <-> server route table
# ---------------------------------------------------------------------------


def _worker_fetch_paths():
    """Every path literal the service worker passes to apiGet/apiPost."""
    src = _read("background.js")
    calls = re.findall(r'api(Get|Post)\(\s*(["`])([^"`]+)\2', src)
    assert calls, "no apiGet/apiPost calls found in background.js"
    paths = []
    for kind, _q, path in calls:
        # `/jobs/${jobId}` template literal -> a representative concrete path
        path = re.sub(r"\$\{\w+\}", "some-id", path)
        paths.append(("GET" if kind == "Get" else "POST", path))
    return paths


def test_every_worker_endpoint_exists_on_server():
    """The reference's bug class: worker calling routes the server lacks."""
    for method, path in _worker_fetch_paths():
        assert _route_matches(method, path), f"{method} {path} has no server route"


def test_worker_covers_the_product_surface():
    paths = {p for _m, p in _worker_fetch_paths()}
    for required in (
        "/download-video",
        "/download-combined",
        "/analyze-video",
        "/analyze-combined",
    ):
        assert required in paths, f"worker lost the {required} flow"


# ---------------------------------------------------------------------------
# UI <-> service worker message actions
# ---------------------------------------------------------------------------


def _worker_actions():
    src = _read("background.js")
    m = re.search(r"const handlers = \{(.*?)\n\};", src, re.S)
    assert m, "handlers map not found in background.js"
    return set(re.findall(r"(?:async\s+)?(\w+)\s*\(", m.group(1)))


def test_every_ui_action_has_a_worker_handler():
    handlers = _worker_actions()
    for page in ("popup.js", "auth.js"):
        src = _read(page)
        for action in re.findall(r'action:\s*"(\w+)"', src):
            if action == "checkVideoPage":
                # answered by the content script, not the worker
                assert action in _read("content.js")
                continue
            assert action in handlers, f"{page} sends unhandled action {action}"


def test_worker_handler_surface_matches_reference_actions():
    # Reference action surface (extension/background.js:43-106) plus the
    # additive async-job actions.
    handlers = _worker_actions()
    for required in (
        "checkAuth",
        "logout",
        "getEnvVars",
        "downloadVideo",
        "downloadCombined",
        "analyzeVideo",
        "analyzeCombined",
    ):
        assert required in handlers, required


# ---------------------------------------------------------------------------
# URL validation parity (worker regexes vs media.acquire)
# ---------------------------------------------------------------------------

SAMPLE_URLS = {
    "youtube": [
        "https://www.youtube.com/watch?v=dQw4w9WgXcQ",
        "https://youtu.be/dQw4w9WgXcQ",
        "https://www.youtube.com/shorts/abc123DEF45",
    ],
    "twitter": [
        "https://twitter.com/user/status/1234567890",
        "https://x.com/user/status/1234567890",
    ],
    "facebook": [
        "https://www.facebook.com/watch?v=123456789",
        "https://fb.watch/abcDEF123/",
        "https://www.facebook.com/somepage/videos/123456789",
    ],
    "reddit": [
        "https://www.reddit.com/r/videos/comments/abc123/title/",
        "https://redd.it/abc123",
    ],
}

NEGATIVE_URLS = [
    "https://example.com/watch?v=nope",
    "https://vimeo.com/12345",
    "not a url",
    "https://youtube.com/",  # no video id
]


def _worker_url_regexes():
    src = _read("background.js")
    m = re.search(r"function validateVideoUrl.*?\[(.*?)\]\.some", src, re.S)
    assert m, "validateVideoUrl pattern list not found"
    # JS regex literals: body may contain escaped chars and character
    # classes (which may hold an unescaped '/').
    body = r"(?:\[[^\]]*\]|\\.|[^/\\\n\[])+"
    return [re.compile(p) for p in re.findall(rf"/({body})/", m.group(1))]


def test_url_validation_agrees_between_worker_and_server():
    worker = _worker_url_regexes()
    for platform, urls in SAMPLE_URLS.items():
        for url in urls:
            got_platform, vid = acquire.get_platform_and_video_id(url)
            assert got_platform == platform, (url, got_platform)
            assert vid, url
            assert any(r.search(url) for r in worker), f"worker rejects {url}"


@pytest.mark.parametrize("url", NEGATIVE_URLS)
def test_url_validation_rejects_garbage_on_both_sides(url):
    platform, _vid = acquire.get_platform_and_video_id(url)
    assert platform is None, (url, platform)
    assert not any(r.search(url) for r in _worker_url_regexes()), url
