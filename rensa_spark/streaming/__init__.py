"""Structured Streaming incremental dedup."""
