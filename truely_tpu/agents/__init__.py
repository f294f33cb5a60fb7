"""Fact-check agents: transcription, web search, LLM judge (off the hot path)."""

from truely_tpu.agents.transcribe import transcribe_audio  # noqa: F401
from truely_tpu.agents.search import perform_search, TRUSTED_DOMAINS  # noqa: F401
from truely_tpu.agents.judge import judge_content, generate_search_query  # noqa: F401
