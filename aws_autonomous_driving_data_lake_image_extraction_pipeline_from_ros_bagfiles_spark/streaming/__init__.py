"""Structured Streaming: incremental ingestion + idempotent sinks."""

from .upsert import max_upsert_stream, read_upsert_state

__all__ = ["max_upsert_stream", "read_upsert_state"]
