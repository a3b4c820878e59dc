"""Structured Streaming: incremental ingest + windowed analytics."""
