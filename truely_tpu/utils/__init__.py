"""Shared utilities: profiling, logging."""

from truely_tpu.utils.profiling import StageTimer, profile_trace  # noqa: F401
