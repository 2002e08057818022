"""Structured Streaming: live ingest into the hot buffer and streaming
tier rollups (the reference's streaming-shaped features, SURVEY §2.8)."""
