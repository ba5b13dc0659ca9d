"""Structured Streaming operators and ingest maintenance."""
