"""Behavioral tests for the extension's JavaScript, executed under the
jsmini interpreter (tests/jsmini/) against fake chrome/DOM/fetch hosts.

Round 1 could only pin static contracts (no JS engine in the image —
VERDICT missing #4); these tests run the actual sources:

- ``background.js``   — message routing, URL validation, API call shapes
  (reference behavior: /root/reference/extension/background.js:43-266)
- ``content.js``      — per-platform video-page heuristics
  (reference: /root/reference/extension/content.js:1-44)
- ``supabase-client.js`` — GoTrue REST flows
  (reference: /root/reference/extension/supabase-js-bundle.js:3-221)
- ``popup.js``        — session gate, platform detect, job-polling
  analysis driver, result rendering (reference: extension/popup.js)
- ``auth.js``         — login/signup/refresh flows (reference:
  extension/auth.js:64-237)

The final test drives the real HTTP server (real sockets, real Detector)
from the extension's own service-worker code.
"""

import json

import pytest

from tests.jsmini.host import (
    BackgroundWorld, FakeChrome, FakeFetch, PageWorld)
from tests.jsmini.interp import js_to_py

CFG = {
    "SUPABASE_URL": "https://proj.supabase.co",
    "SUPABASE_ANON_KEY": "anon-key",
    "SERVER_URL": "http://localhost:5001",
}


def make_background(config=None, routes=(), storage=None):
    chrome = FakeChrome()
    if storage:
        chrome.storage.update(storage)
    fetch = FakeFetch()
    for method, url_substr, responder in routes:
        fetch.route(method, url_substr, responder)
    bg = BackgroundWorld(chrome=chrome, fetch=fetch, config=config)
    return bg, chrome, fetch


# ---- background.js ---------------------------------------------------------

class TestBackground:
    def test_get_env_vars_defaults_without_config(self):
        bg, _, _ = make_background(config=None)
        resp = bg.send({"action": "getEnvVars"})
        assert resp == {
            "success": True, "SUPABASE_URL": "", "SUPABASE_ANON_KEY": "",
            "SERVER_URL": "http://localhost:5001",
        }
        # The missing config.js is warned about, not fatal (reference
        # background.js:7 imports it unconditionally and dies without it).
        assert any(lvl == "warn" and "config.js" in msg
                   for lvl, msg in bg.interp.console)

    def test_get_env_vars_with_config(self):
        bg, _, _ = make_background(config=CFG)
        resp = bg.send({"action": "getEnvVars"})
        assert resp["SUPABASE_URL"] == CFG["SUPABASE_URL"]
        assert resp["SERVER_URL"] == CFG["SERVER_URL"]

    def test_check_auth_reflects_stored_session(self):
        bg, chrome, _ = make_background()
        assert bg.send({"action": "checkAuth"})["isAuthenticated"] is False
        chrome.storage["session"] = {"access_token": "tok"}
        assert bg.send({"action": "checkAuth"})["isAuthenticated"] is True
        chrome.storage["session"] = {"user": "no-token"}
        assert bg.send({"action": "checkAuth"})["isAuthenticated"] is False

    def test_logout_removes_session(self):
        bg, chrome, _ = make_background(
            storage={"session": {"access_token": "tok"}})
        resp = bg.send({"action": "logout"})
        assert resp["success"] is True
        assert "session" not in chrome.storage

    def test_download_video_builds_query(self):
        bg, _, fetch = make_background(routes=[
            ("GET", "/download-video",
             (200, {"videoPath": "/tmp/v.mp4", "videoResultId": "rid"}))])
        resp = bg.send({
            "action": "downloadVideo",
            "videoUrl": "https://www.youtube.com/watch?v=abc123"})
        assert resp["success"] is True
        assert resp["videoPath"] == "/tmp/v.mp4"
        (call,) = fetch.calls
        assert call["method"] == "GET"
        assert call["url"].startswith(
            "http://localhost:5001/download-video?")
        assert "video_url=" in call["url"]
        assert "quality=360p" in call["url"]  # reference default quality

    def test_download_combined_defaults_mp3_360p(self):
        bg, _, fetch = make_background(routes=[
            ("GET", "/download-combined",
             (200, {"videoPath": "v", "audioPath": "a"}))])
        resp = bg.send({"action": "downloadCombined",
                        "videoUrl": "https://youtu.be/abc"})
        assert resp["success"] is True
        (call,) = fetch.calls
        assert "audio_format=mp3" in call["url"]
        assert "quality=360p" in call["url"]

    def test_download_quality_override(self):
        bg, _, fetch = make_background(routes=[
            ("GET", "/download-combined", (200, {}))])
        bg.send({"action": "downloadCombined",
                 "videoUrl": "https://youtu.be/abc", "quality": "720p"})
        assert "quality=720p" in fetch.calls[0]["url"]

    def test_invalid_url_rejected_without_network(self):
        bg, _, fetch = make_background()
        resp = bg.send({"action": "downloadVideo",
                        "videoUrl": "https://evil.example.com/x"})
        assert resp == {"success": False, "error": "Unsupported URL format"}
        assert fetch.calls == []  # rejected before any fetch

    def test_analyze_video_posts_json_body(self):
        bg, _, fetch = make_background(routes=[
            ("POST", "/analyze-video", (200, {"fakeScore": 12}))])
        resp = bg.send({"action": "analyzeVideo", "videoPath": "/tmp/v.mp4"})
        assert resp["success"] is True and resp["fakeScore"] == 12
        (call,) = fetch.calls
        assert call["body"] == {"videoPath": "/tmp/v.mp4"}
        assert call["headers"]["Content-Type"] == "application/json"

    def test_analyze_combined_posts_both_paths(self):
        bg, _, fetch = make_background(routes=[
            ("POST", "/analyze-combined", (200, {"fakeScore": 88}))])
        resp = bg.send({"action": "analyzeCombined",
                        "videoPath": "v.mp4", "audioPath": "a.mp3"})
        assert resp["fakeScore"] == 88
        assert fetch.calls[0]["body"] == {
            "videoPath": "v.mp4", "audioPath": "a.mp3"}

    def test_job_surface_submit_and_poll(self):
        bg, _, fetch = make_background(routes=[
            ("POST", "/jobs/analyze-combined", (200, {"jobId": "j7"})),
            ("GET", "/jobs/j7", (200, {"status": "running"}))])
        sub = bg.send({"action": "submitAnalyzeCombined",
                       "videoPath": "v", "audioPath": "a"})
        assert sub["jobId"] == "j7"
        status = bg.send({"action": "getJobStatus", "jobId": "j7"})
        assert status["status"] == "running"

    def test_server_error_body_propagates(self):
        bg, _, _ = make_background(routes=[
            ("GET", "/download-video",
             (404, {"error": "No video found at URL"}))])
        resp = bg.send({"action": "downloadVideo",
                        "videoUrl": "https://youtu.be/abc"})
        assert resp == {"success": False, "error": "No video found at URL"}

    def test_server_error_without_body_uses_status(self):
        bg, _, _ = make_background(routes=[
            ("GET", "/download-video", (500, {}))])
        resp = bg.send({"action": "downloadVideo",
                        "videoUrl": "https://youtu.be/abc"})
        assert resp == {"success": False, "error": "HTTP 500"}

    def test_unknown_action(self):
        bg, _, _ = make_background()
        resp = bg.send({"action": "selfDestruct"})
        assert resp == {"success": False,
                        "error": "Unknown action: selfDestruct"}


VALID_URLS = [
    "https://www.youtube.com/watch?v=dQw4w9WgXcQ",
    "https://www.youtube.com/shorts/abc123",
    "https://youtu.be/abc123",
    "https://twitter.com/user/status/1234567890",
    "https://x.com/user/status/1234567890",
    "https://www.facebook.com/somepage/videos/123/",
    "https://www.facebook.com/watch?v=123",
    "https://fb.watch/xyz/",
    "https://www.reddit.com/r/videos/comments/abc/title/",
    "https://redd.it/abc",
]
INVALID_URLS = [
    "",
    "https://vimeo.com/12345",
    "https://x.com/user/likes",
    "https://www.reddit.com/r/videos/",
    "not a url",
]


class TestUrlValidation:
    @pytest.fixture(scope="class")
    def bg(self):
        bg, _, fetch = make_background(routes=[
            ("GET", "/download-video", (200, {}))])
        return bg

    @pytest.mark.parametrize("url", VALID_URLS)
    def test_accepts(self, bg, url):
        resp = bg.send({"action": "downloadVideo", "videoUrl": url})
        assert resp["success"] is True, url

    @pytest.mark.parametrize("url", INVALID_URLS)
    def test_rejects(self, bg, url):
        resp = bg.send({"action": "downloadVideo", "videoUrl": url})
        assert resp == {"success": False,
                        "error": "Unsupported URL format"}, url


# ---- content.js ------------------------------------------------------------

def content_probe(href, has_video):
    chrome = FakeChrome()
    page = PageWorld(chrome, href=href, scripts=["content.js"])
    if has_video:
        page.document.query_results["video"] = page.document.ensure(
            "__the_video__", tag="video")
    (listener_pair,) = chrome.message_listeners
    interp, fn = listener_pair
    captured = {}

    def send_response(i, t, a):
        captured["resp"] = js_to_py(a[0] if a else None)
        from tests.jsmini.interp import UNDEF
        return UNDEF

    from tests.jsmini.interp import NativeFunction, py_to_js, JSObject
    interp.call(fn, [py_to_js({"action": "checkVideoPage"}), JSObject(),
                     NativeFunction(send_response, "sendResponse")])
    interp.drain()
    return captured.get("resp")


class TestContentScript:
    def test_youtube_watch_url_is_enough(self):
        resp = content_probe("https://www.youtube.com/watch?v=abc", False)
        assert resp["isVideoPage"] is True
        assert resp["url"] == "https://www.youtube.com/watch?v=abc"

    def test_youtube_other_page_needs_video_element(self):
        assert content_probe("https://www.youtube.com/feed/subscriptions",
                             False)["isVideoPage"] is False
        assert content_probe("https://www.youtube.com/feed/subscriptions",
                             True)["isVideoPage"] is True

    def test_twitter_requires_status_and_video(self):
        assert content_probe("https://x.com/user/status/123",
                             True)["isVideoPage"] is True
        assert content_probe("https://x.com/user/status/123",
                             False)["isVideoPage"] is False
        assert content_probe("https://x.com/user",
                             True)["isVideoPage"] is False

    def test_facebook_watch_or_video(self):
        assert content_probe("https://www.facebook.com/watch?v=1",
                             False)["isVideoPage"] is True
        assert content_probe("https://www.facebook.com/profile",
                             True)["isVideoPage"] is True

    def test_reddit_comments_with_video(self):
        assert content_probe(
            "https://www.reddit.com/r/aivideos/comments/abc/x/",
            True)["isVideoPage"] is True
        assert content_probe(
            "https://www.reddit.com/r/aivideos/comments/abc/x/",
            False)["isVideoPage"] is False

    def test_unknown_host_is_false(self):
        assert content_probe("https://example.com/watch",
                             True)["isVideoPage"] is False

    def test_other_actions_not_answered(self):
        chrome = FakeChrome()
        page = PageWorld(chrome, href="https://www.youtube.com/watch?v=1",
                         scripts=["content.js"])
        (pair,) = chrome.message_listeners
        interp, fn = pair
        captured = {}
        from tests.jsmini.interp import NativeFunction, py_to_js, JSObject, \
            UNDEF
        interp.call(fn, [py_to_js({"action": "somethingElse"}), JSObject(),
                         NativeFunction(
                             lambda i, t, a: captured.update(resp=True)
                             or UNDEF, "sendResponse")])
        interp.drain()
        assert captured == {}


# ---- supabase-client.js ----------------------------------------------------

def make_supabase(routes):
    chrome = FakeChrome()
    fetch = FakeFetch()
    for r in routes:
        fetch.route(*r)
    page = PageWorld(chrome, fetch=fetch,
                     scripts=["supabase-client.js"])
    page.interp.run(
        "var __client = window.supabase.createClient("
        "'https://proj.supabase.co/', 'anon-key');")
    client = page.interp.genv.lookup("__client")
    return page, fetch, client


def call_auth(page, client, method_src):
    """Evaluate `__client.auth.<method_src>` and settle the promise."""
    page.interp.genv.declare("__client", client)
    page.interp.run(
        f"var __res = null;\n"
        f"(async () => {{ __res = await __client.auth.{method_src}; }})();")
    page.interp.drain()
    return js_to_py(page.interp.genv.lookup("__res"))


class TestSupabaseClient:
    def test_sign_in_success_shape_and_headers(self):
        page, fetch, client = make_supabase([
            ("POST", "/auth/v1/token?grant_type=password",
             (200, {"access_token": "at", "refresh_token": "rt",
                    "user": {"email": "e@x.com"}}))])
        res = call_auth(page, client,
                        "signInWithPassword({ email: 'e@x.com', "
                        "password: 'pw' })")
        assert res["error"] is None
        assert res["data"]["session"]["access_token"] == "at"
        assert res["data"]["user"]["email"] == "e@x.com"
        call = fetch.calls[-1]
        assert call["url"] == ("https://proj.supabase.co/auth/v1/token"
                               "?grant_type=password")
        assert call["headers"]["apikey"] == "anon-key"
        assert call["headers"]["Authorization"] == "Bearer anon-key"
        assert call["body"] == {"email": "e@x.com", "password": "pw"}

    def test_sign_in_error_maps_error_description(self):
        page, fetch, client = make_supabase([
            ("POST", "/auth/v1/token?grant_type=password",
             (400, {"error_description": "Invalid login credentials"}))])
        res = call_auth(page, client,
                        "signInWithPassword({ email: 'e', password: 'p' })")
        assert res["data"] is None
        assert res["error"]["message"] == "Invalid login credentials"
        assert res["error"]["status"] == 400

    def test_error_message_fallback_chain(self):
        for body, expected in [
            ({"msg": "from-msg"}, "from-msg"),
            ({"message": "from-message"}, "from-message"),
            ({}, "auth error"),
        ]:
            page, _, client = make_supabase([
                ("POST", "/auth/v1/token?grant_type=password",
                 (400, body))])
            res = call_auth(
                page, client,
                "signInWithPassword({ email: 'e', password: 'p' })")
            assert res["error"]["message"] == expected

    def test_sign_up_verification_pending_has_null_session(self):
        page, _, client = make_supabase([
            ("POST", "/auth/v1/signup",
             (200, {"id": "u1", "email": "e@x.com"}))])  # no access_token
        res = call_auth(page, client,
                        "signUp({ email: 'e@x.com', password: 'pw' })")
        assert res["error"] is None
        assert res["data"]["session"] is None
        assert res["data"]["user"]["email"] == "e@x.com"

    def test_sign_up_autoconfirmed_returns_session(self):
        page, _, client = make_supabase([
            ("POST", "/auth/v1/signup",
             (200, {"access_token": "at", "user": {"id": "u1"}}))])
        res = call_auth(page, client, "signUp({ email: 'e', password: 'p' })")
        assert res["data"]["session"]["access_token"] == "at"

    def test_get_user_sends_bearer_token(self):
        page, fetch, client = make_supabase([
            ("GET", "/auth/v1/user", (200, {"id": "u1"}))])
        res = call_auth(page, client, "getUser('user-token')")
        assert res["data"]["user"]["id"] == "u1"
        assert fetch.calls[-1]["headers"]["Authorization"] == \
            "Bearer user-token"

    def test_refresh_session_posts_refresh_token(self):
        page, fetch, client = make_supabase([
            ("POST", "/auth/v1/token?grant_type=refresh_token",
             (200, {"access_token": "new", "refresh_token": "rt2"}))])
        res = call_auth(page, client,
                        "refreshSession({ refresh_token: 'rt1' })")
        assert res["data"]["session"]["access_token"] == "new"
        assert fetch.calls[-1]["body"] == {"refresh_token": "rt1"}

    def test_sign_out_hits_logout(self):
        page, fetch, client = make_supabase([
            ("POST", "/auth/v1/logout", (204, {}))])
        res = call_auth(page, client, "signOut('tok')")
        assert res["error"] is None
        assert fetch.calls[-1]["url"].endswith("/auth/v1/logout")
        assert fetch.calls[-1]["headers"]["Authorization"] == "Bearer tok"

    def test_auth_state_events_and_unsubscribe(self):
        page, _, client = make_supabase([
            ("POST", "/auth/v1/token?grant_type=password",
             (200, {"access_token": "at"}))])
        page.interp.genv.declare("__client", client)
        page.interp.run("""
        var events = [];
        const { data } = __client.auth.onAuthStateChange(
          (event, session) => { events.push(event); });
        """)
        call_auth(page, client,
                  "signInWithPassword({ email: 'e', password: 'p' })")
        assert js_to_py(page.interp.genv.lookup("events")) == ["SIGNED_IN"]
        page.interp.run("data.subscription.unsubscribe();")
        call_auth(page, client,
                  "signInWithPassword({ email: 'e', password: 'p' })")
        assert js_to_py(page.interp.genv.lookup("events")) == ["SIGNED_IN"]


# ---- popup.js --------------------------------------------------------------

def make_popup(storage=None, tabs=(), tab_handler=None, routes=(),
               config=None):
    chrome = FakeChrome()
    if storage:
        chrome.storage.update(storage)
    chrome.tabs = list(tabs)
    chrome.tab_message_handler = tab_handler
    fetch = FakeFetch()
    for r in routes:
        fetch.route(*r)
    bg = BackgroundWorld(chrome=chrome, fetch=fetch, config=config)
    popup = PageWorld(chrome, href="chrome-extension://ext/popup.html",
                      scripts=["popup.js"], loop=bg.loop,
                      html="popup.html")
    return popup, bg, chrome, fetch


AUTHED = {"session": {"access_token": "tok"}}
YT_TAB = ({"id": 1, "url": "https://www.youtube.com/watch?v=abc",
           "active": True},)


def video_page_handler(tab_id, msg):
    return {"isVideoPage": True, "url": "u"}


def done_job_routes(score=72, with_news=True):
    result = {"status": "done", "jobId": "j1", "fakeScore": score,
              "resultId": "r9"}
    if with_news:
        result.update({"verdict": "Misleading", "newsScore": 50,
                       "newsSummary": "disputed claims",
                       "evidence": [{"title": "Coverage", "url":
                                     "https://news.example/a"},
                                    {"url": "https://news.example/b"}]})
    state = {"n": 0}

    def job_status(call):
        state["n"] += 1
        if state["n"] == 1:
            return (200, {"status": "queued", "jobId": "j1"})
        if state["n"] == 2:
            return (200, {"status": "running", "jobId": "j1"})
        return (200, result)

    return [
        ("GET", "/download-combined",
         (200, {"videoPath": "/tmp/v.mp4", "audioPath": "/tmp/a.mp3"})),
        ("POST", "/jobs/analyze-combined", (200, {"jobId": "j1"})),
        ("GET", "/jobs/j1", job_status),
    ]


class TestPopup:
    def test_unauthenticated_redirects_to_auth(self):
        popup, *_ = make_popup(storage=None, tabs=YT_TAB)
        assert popup.location.navigations == ["auth.html"]

    def test_non_platform_tab_shows_hint_and_keeps_disabled(self):
        popup, *_ = make_popup(
            storage=AUTHED,
            tabs=({"id": 1, "url": "https://example.com", "active": True},))
        assert "Open a YouTube" in popup.el("platform-name").text
        assert popup.el("analyze-btn").obj.props["disabled"] is True

    def test_platform_tab_without_video_detected(self):
        popup, *_ = make_popup(
            storage=AUTHED, tabs=YT_TAB,
            tab_handler=lambda t, m: {"isVideoPage": False, "url": "u"})
        assert "no video detected" in popup.el("platform-name").text
        assert popup.el("analyze-btn").obj.props["disabled"] is True

    def test_content_script_unavailable_assumes_url_is_enough(self):
        # chrome.tabs.sendMessage rejects when no content script answers;
        # the popup treats the URL match as sufficient.
        popup, *_ = make_popup(storage=AUTHED, tabs=YT_TAB,
                               tab_handler=None)
        assert popup.el("platform-name").text == "YouTube page detected"
        assert popup.el("analyze-btn").obj.props["disabled"] is False

    def test_platform_labels(self):
        for url, label in [
            ("https://x.com/u/status/1", "X / Twitter"),
            ("https://www.facebook.com/watch?v=1", "Facebook"),
            ("https://redd.it/abc", "Reddit"),
        ]:
            popup, *_ = make_popup(
                storage=AUTHED,
                tabs=({"id": 1, "url": url, "active": True},),
                tab_handler=video_page_handler)
            assert popup.el("platform-name").text == f"{label} page detected"

    def test_full_analysis_flow_renders_fake_result(self):
        popup, bg, chrome, fetch = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
            routes=done_job_routes(score=72))
        popup.click("analyze-btn")
        # API choreography: download -> submit job -> poll until done.
        paths = [c["url"].split("?")[0].rsplit("/", 1)[-1] if "/jobs/" not
                 in c["url"] else c["url"].split("5001")[-1]
                 for c in fetch.calls]
        assert [c["method"] for c in fetch.calls] == [
            "GET", "POST", "GET", "GET", "GET"]
        assert fetch.calls[1]["body"] == {
            "videoPath": "/tmp/v.mp4", "audioPath": "/tmp/a.mp3"}
        # Rendering: fake verdict (score > 50 — reference popup.js:317).
        assert popup.el("score-num").text == "72"
        assert "fake" in popup.el("score-ring").classes
        assert popup.el("score-verdict").text == "Likely AI-generated"
        assert popup.el("results").hidden is False
        assert popup.el("progress").hidden is True
        # News block with evidence links; title falls back to URL.
        assert popup.el("news-block").hidden is False
        assert popup.el("news-verdict").text == "Misleading"
        assert popup.el("news-score").text == "credibility 50"
        links = [js_to_py(c) for c in popup.el("evidence").children]
        assert [l["href"] for l in links] == [
            "https://news.example/a", "https://news.example/b"]
        assert links[0]["textContent"] == "Coverage"
        assert links[1]["textContent"] == "https://news.example/b"
        assert links[0]["rel"] == "noopener"
        # Report deep link through the configured server URL.
        assert popup.el("report-link").obj.props["href"] == \
            "http://localhost:5001/view/r9"
        # Button re-enabled for another run.
        assert popup.el("analyze-btn").obj.props["disabled"] is False

    def test_authentic_score_renders_real_verdict(self):
        popup, *_ = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
            routes=done_job_routes(score=12, with_news=False))
        popup.click("analyze-btn")
        assert popup.el("score-num").text == "12"
        assert "fake" not in popup.el("score-ring").classes
        assert popup.el("score-verdict").text == "Likely authentic"
        # Video-only result: news block stays hidden.
        assert popup.el("news-block").hidden is True

    def test_stat_cards_and_inline_preview(self):
        # Band-derived stat cards (same cut points as the reference popup,
        # extension/popup.js:323-337: consistency/anomaly flip at 25/75,
        # confidence at the 70/90 fake scores = |score-50| > 20 / > 40) and
        # the inline annotated preview streamed from /video/{id}.
        for score, cons, anom, conf in [
            (95, "Very Low", "Very High", "Very High"),
            (72, "Low", "High", "High"),
            (60, "Low", "High", "Medium"),
            (30, "High", "Low", "Medium"),
            (12, "Very High", "Very Low", "High"),
            (5, "Very High", "Very Low", "Very High"),
        ]:
            popup, *_ = make_popup(
                storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
                routes=done_job_routes(score=score, with_news=False))
            assert popup.el("preview").hidden is True
            popup.click("analyze-btn")
            assert popup.el("stat-consistency").text == cons, score
            assert popup.el("stat-anomalies").text == anom, score
            assert popup.el("stat-confidence").text == conf, score
            assert popup.el("preview").hidden is False
            assert popup.el("preview").obj.props["src"] == \
                "http://localhost:5001/video/r9"

    def test_boundary_score_50_is_authentic(self):
        # Strict > 50, matching the reference's popup.js:317.
        popup, *_ = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
            routes=done_job_routes(score=50, with_news=False))
        popup.click("analyze-btn")
        assert popup.el("score-verdict").text == "Likely authentic"

    def test_fallback_to_blocking_endpoint_when_jobs_absent(self):
        routes = [
            ("GET", "/download-combined",
             (200, {"videoPath": "v", "audioPath": "a"})),
            ("POST", "/jobs/analyze-combined",
             (404, {"error": "not found"})),
            ("POST", "/analyze-combined",
             (200, {"fakeScore": 61, "resultId": "r1"})),
        ]
        popup, _, _, fetch = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
            routes=routes)
        popup.click("analyze-btn")
        assert popup.el("score-num").text == "61"
        assert fetch.calls[-1]["url"].endswith("/analyze-combined")

    def test_download_failure_shows_error(self):
        popup, *_ = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
            routes=[("GET", "/download-combined",
                     (404, {"error": "No video found at URL"}))])
        popup.click("analyze-btn")
        assert popup.el("error").hidden is False
        assert popup.el("error").text == "No video found at URL"
        assert popup.el("results").hidden is True
        assert popup.el("analyze-btn").obj.props["disabled"] is False

    def test_failed_job_shows_error(self):
        routes = [
            ("GET", "/download-combined",
             (200, {"videoPath": "v", "audioPath": "a"})),
            ("POST", "/jobs/analyze-combined", (200, {"jobId": "j1"})),
            ("GET", "/jobs/j1",
             (200, {"status": "failed", "error": "decode error"})),
        ]
        popup, *_ = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler,
            routes=routes)
        popup.click("analyze-btn")
        assert popup.el("error").text == "decode error"

    def test_logout_button_clears_session_and_redirects(self):
        popup, _, chrome, _ = make_popup(
            storage=AUTHED, tabs=YT_TAB, tab_handler=video_page_handler)
        popup.click("logout-btn")
        assert "session" not in chrome.storage
        assert popup.location.navigations[-1] == "auth.html"


# ---- auth.js ---------------------------------------------------------------

def make_auth(config, storage=None, routes=()):
    chrome = FakeChrome()
    if storage:
        chrome.storage.update(storage)
    fetch = FakeFetch()
    for r in routes:
        fetch.route(*r)
    bg = BackgroundWorld(chrome=chrome, fetch=fetch, config=config)
    page = PageWorld(chrome, fetch=fetch,
                     href="chrome-extension://ext/auth.html",
                     scripts=["supabase-client.js", "auth.js"], loop=bg.loop,
                     html="auth.html")
    return page, chrome, fetch


class TestAuthPage:
    def test_no_config_lets_local_dev_through(self):
        page, chrome, _ = make_auth(config=None)
        assert page.location.navigations == ["popup.html"]
        assert chrome.storage["session"]["access_token"] == "local-dev"
        assert chrome.storage["session"]["local"] is True

    def test_valid_stored_session_skips_login(self):
        page, _, fetch = make_auth(
            config=CFG,
            storage={"session": {"access_token": "at",
                                 "refresh_token": "rt"}},
            routes=[("GET", "/auth/v1/user", (200, {"id": "u1"}))])
        assert page.location.navigations == ["popup.html"]
        assert fetch.calls[-1]["headers"]["Authorization"] == "Bearer at"

    def test_stale_token_refresh_rotation(self):
        def user_route(call):
            if call["headers"].get("Authorization") == "Bearer stale":
                return (401, {"msg": "token expired"})
            return (200, {"id": "u1"})

        page, chrome, fetch = make_auth(
            config=CFG,
            storage={"session": {"access_token": "stale",
                                 "refresh_token": "rt"}},
            routes=[
                ("GET", "/auth/v1/user", user_route),
                ("POST", "/auth/v1/token?grant_type=refresh_token",
                 (200, {"access_token": "fresh", "refresh_token": "rt2"}))])
        assert page.location.navigations == ["popup.html"]
        # Rotated session persisted (reference auth.js:198-237 behavior).
        assert chrome.storage["session"]["access_token"] == "fresh"
        assert chrome.storage["session"]["refresh_token"] == "rt2"

    def test_dead_session_cleared_and_form_shown(self):
        page, chrome, _ = make_auth(
            config=CFG,
            storage={"session": {"access_token": "stale"}},  # no refresh
            routes=[("GET", "/auth/v1/user", (401, {"msg": "expired"}))])
        assert page.location.navigations == []
        assert "session" not in chrome.storage

    def test_login_submit_success(self):
        page, chrome, fetch = make_auth(
            config=CFG,
            routes=[("POST", "/auth/v1/token?grant_type=password",
                     (200, {"access_token": "at", "refresh_token": "rt"}))])
        page.el("email").obj.props["value"] = "  e@x.com  "  # gets trimmed
        page.el("password").obj.props["value"] = "pw"
        page.submit("auth-form")
        assert fetch.calls[-1]["body"] == {"email": "e@x.com",
                                           "password": "pw"}
        assert chrome.storage["session"]["access_token"] == "at"
        assert page.location.navigations == ["popup.html"]
        assert page.el("submit-btn").obj.props["disabled"] is False

    def test_login_failure_shows_message(self):
        page, chrome, _ = make_auth(
            config=CFG,
            routes=[("POST", "/auth/v1/token?grant_type=password",
                     (400, {"error_description":
                            "Invalid login credentials"}))])
        page.el("email").obj.props["value"] = "e@x.com"
        page.el("password").obj.props["value"] = "bad"
        page.submit("auth-form")
        assert page.el("auth-message").text == "Invalid login credentials"
        assert page.el("auth-message").obj.props["className"] == "err"
        assert page.location.navigations == []
        assert "session" not in chrome.storage

    def test_signup_with_email_verification_switches_to_login(self):
        page, chrome, _ = make_auth(
            config=CFG,
            routes=[("POST", "/auth/v1/signup",
                     (200, {"id": "u1", "email": "e@x.com"}))])
        page.click("tab-signup")
        assert page.el("submit-btn").text == "Create account"
        page.el("email").obj.props["value"] = "e@x.com"
        page.el("password").obj.props["value"] = "pw"
        page.submit("auth-form")
        assert "Check your email" in page.el("auth-message").text
        assert page.el("auth-message").obj.props["className"] == "ok"
        # Mode switched back to login.
        assert page.el("submit-btn").text == "Sign in"
        assert "active" in page.el("tab-login").classes
        assert "active" not in page.el("tab-signup").classes
        assert page.location.navigations == []

    def test_signup_autoconfirmed_goes_straight_in(self):
        page, chrome, _ = make_auth(
            config=CFG,
            routes=[("POST", "/auth/v1/signup",
                     (200, {"access_token": "at", "user": {"id": "u"}}))])
        page.click("tab-signup")
        page.el("email").obj.props["value"] = "e@x.com"
        page.el("password").obj.props["value"] = "pw"
        page.submit("auth-form")
        assert chrome.storage["session"]["access_token"] == "at"
        assert page.location.navigations == ["popup.html"]


# ---- extension JS against the real HTTP server -----------------------------

class NoNewsAgents:
    def transcribe_audio(self, path):
        raise RuntimeError("no network in tests")


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    """The real TruelyServer with a tiny real Detector on a real socket."""
    import numpy as np
    import cv2
    from truely_tpu.config import DetectorConfig, MTCNNConfig, ServerConfig
    from truely_tpu.pipeline.detector import Detector
    from truely_tpu.serve.app import TruelyServer
    from truely_tpu.serve.http import make_server, serve_forever_in_thread
    from truely_tpu.serve.results import ResultStore

    detector = Detector(DetectorConfig(
        frame_batch=8, compute_dtype="float32",
        mtcnn=MTCNNConfig(pnet_topk_total=16, rnet_capacity=8,
                          onet_capacity=4, thresholds=(0.5, 0.3, 0.2))))
    app = TruelyServer(ServerConfig(), detector=detector,
                       agents=NoNewsAgents(), store=ResultStore(),
                       tavily_api_key="", gemini_api_key="")
    httpd = make_server(app.router, "127.0.0.1", 0)
    port = httpd.server_address[1]
    serve_forever_in_thread(httpd)

    tmp = tmp_path_factory.mktemp("ext_live")

    def make_clip(name):
        # Fresh clip per test: the server deletes inputs after analysis
        # (reference server.py:941-949 behavior).
        video = str(tmp / name)
        writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                                 (96, 64))
        rng = np.random.default_rng(0)
        for _ in range(12):
            writer.write(cv2.blur(
                rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8),
                (9, 9)))
        writer.release()
        return video

    yield f"http://127.0.0.1:{port}", make_clip
    httpd.shutdown()


@pytest.mark.slow
class TestExtensionAgainstRealServer:
    def test_analyze_video_through_service_worker(self, live_server):
        base, make_clip = live_server
        video = make_clip("a.mp4")
        chrome = FakeChrome()
        fetch = FakeFetch()
        fetch.live_base = base
        bg = BackgroundWorld(chrome=chrome, fetch=fetch,
                             config={"SERVER_URL": base})
        resp = bg.send({"action": "analyzeVideo", "videoPath": video})
        assert resp["success"] is True
        assert 0 <= resp["fakeScore"] <= 100
        assert resp["resultId"]

    def test_job_flow_through_service_worker(self, live_server):
        base, make_clip = live_server
        video = make_clip("b.mp4")
        chrome = FakeChrome()
        fetch = FakeFetch()
        fetch.live_base = base
        bg = BackgroundWorld(chrome=chrome, fetch=fetch,
                             config={"SERVER_URL": base})
        sub = bg.send({"action": "submitAnalyzeCombined",
                       "videoPath": video})
        assert sub["success"] is True and sub["jobId"]
        import time
        for _ in range(600):
            status = bg.send({"action": "getJobStatus",
                              "jobId": sub["jobId"]})
            if status["status"] in ("done", "failed"):
                break
            time.sleep(0.25)
        assert status["status"] == "done"
        assert 0 <= status["fakeScore"] <= 100
