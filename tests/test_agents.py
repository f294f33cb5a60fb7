"""Agent-client tests over httpx.MockTransport (no network).

Covers the behavioral contracts of reference server/web/utils/*: Groq
transcription error/empty handling, Tavily result filtering + the fixed
trusted-domain list, Gemini JSON cleaning (fences, brace repair), the
parse-failure stub verdict, and the 30-word/350-char fallback query.
"""

import json

import httpx
import pytest

from truely_tpu.agents.judge import (
    _clean_json_text, judge_content, generate_search_query, score_similarity,
)
from truely_tpu.agents.search import perform_search, TRUSTED_DOMAINS
from truely_tpu.agents.transcribe import transcribe_audio


def gemini_transport(text):
    def handler(request):
        return httpx.Response(
            200,
            json={"candidates": [{"content": {"parts": [{"text": text}]}}]},
        )

    return httpx.MockTransport(handler)


def test_trusted_domains_fixed():
    # the reference concatenates foxnews+aljazeera via a missing comma
    assert "foxnews.com" in TRUSTED_DOMAINS
    assert "aljazeera.com" in TRUSTED_DOMAINS
    assert "foxnews.comaljazeera.com" not in TRUSTED_DOMAINS
    assert len(TRUSTED_DOMAINS) == 6


def test_clean_json_text():
    assert _clean_json_text('```json\n{"a": 1}\n```') == '{"a": 1}'
    assert _clean_json_text('```\n{"a": 1}\n```') == '{"a": 1}'
    assert _clean_json_text('"verdict": "Fake"') == '{"verdict": "Fake"}'
    assert _clean_json_text('{"a": 1}') == '{"a": 1}'


def test_judge_content_ok():
    out = judge_content(
        "transcript", [{"title": "t", "url": "u"}], "key",
        transport=gemini_transport(
            '```json\n{"verdict": "Misleading", "confidence": 60, '
            '"reasoning": "r", "sources": []}\n```'
        ),
    )
    assert out["verdict"] == "Misleading"
    assert out["confidence"] == 60


def test_judge_content_parse_failure_stub():
    out = judge_content("t", [], "key", transport=gemini_transport("not { json ]"))
    assert out["verdict"] == "uncertain"
    assert out["confidence"] == 0
    assert "Error parsing model response" in out["reasoning"]


def test_judge_content_http_error():
    transport = httpx.MockTransport(lambda r: httpx.Response(500, text="boom"))
    with pytest.raises(RuntimeError, match="Gemini error"):
        judge_content("t", [], "key", transport=transport)


def test_generate_search_query_ok():
    q = generate_search_query(
        "some transcript", "key",
        transport=gemini_transport('{"query": "  the query  "}'),
    )
    assert q == "the query"


def test_generate_search_query_fallbacks():
    words = " ".join(f"w{i}" for i in range(50))
    # empty query -> first 30 words
    q = generate_search_query(words, "key", transport=gemini_transport('{"query": ""}'))
    assert q == " ".join(f"w{i}" for i in range(30))
    # unparseable -> first 30 words
    q = generate_search_query(words, "key", transport=gemini_transport("garbage ["))
    assert q == " ".join(f"w{i}" for i in range(30))
    # cap at 350 chars
    long_words = " ".join("x" * 20 for _ in range(30))
    q = generate_search_query(
        long_words, "key", transport=gemini_transport('{"query": ""}')
    )
    assert len(q) <= 350


def test_score_similarity():
    assert score_similarity("t", "a", "k",
                            transport=gemini_transport('{"score": 0.75}')) == 0.75
    assert score_similarity("t", "a", "k",
                            transport=gemini_transport('{"score": 7}')) == 1.0
    assert score_similarity("t", "a", "k",
                            transport=gemini_transport("junk [")) == 0.0


def test_perform_search_filtering():
    results = [
        {"title": "Fresh news", "url": "https://bbc.com/news/2025/x",
         "content": "body", "score": 0.9},
        {"title": "From the archives", "url": "https://cnn.com/archive/old",
         "content": "old", "score": 0.5},
        {"title": "Television this week", "url": "https://bbc.com/tv",
         "content": "listing", "score": 0.4},
        {"title": "2019 piece", "url": "https://cnn.com/2019/story",
         "content": "dated", "score": 0.3},
    ]

    def handler(request):
        body = json.loads(request.content)
        assert body["search_depth"] == "advanced"
        assert body["include_domains"] == TRUSTED_DOMAINS
        return httpx.Response(200, json={"results": results})

    out = perform_search("q", "key", transport=httpx.MockTransport(handler))
    assert [r["title"] for r in out] == ["Fresh news"]
    assert out[0]["snippet"] == "body"


def test_perform_search_error():
    transport = httpx.MockTransport(lambda r: httpx.Response(403, text="denied"))
    with pytest.raises(RuntimeError, match=r"web search request failed \(HTTP 403\)"):
        perform_search("q", "key", transport=transport)


def test_transcribe_ok(tmp_path):
    audio = tmp_path / "a.mp3"
    audio.write_bytes(b"audio")

    def handler(request):
        assert b"whisper-large-v3-turbo" in request.content
        return httpx.Response(200, json={"text": "hello world"})

    out = transcribe_audio(str(audio), transport=httpx.MockTransport(handler))
    assert out == "hello world"


def test_transcribe_empty_raises(tmp_path):
    audio = tmp_path / "a.mp3"
    audio.write_bytes(b"audio")
    transport = httpx.MockTransport(lambda r: httpx.Response(200, json={"text": ""}))
    with pytest.raises(RuntimeError, match="Empty transcription"):
        transcribe_audio(str(audio), transport=transport)


def test_transcribe_http_error(tmp_path):
    audio = tmp_path / "a.mp3"
    audio.write_bytes(b"audio")
    transport = httpx.MockTransport(lambda r: httpx.Response(401, text="bad key"))
    with pytest.raises(RuntimeError, match="Groq transcription error"):
        transcribe_audio(str(audio), transport=transport)
