"""Structured Streaming surface (SURVEY.md §2.10, §7 step 5)."""

from .events import run_stream_to_memory, stream_events, tumbling_counts  # noqa: F401
