"""Structured Streaming: incremental raw-zone processing (T1–T5) and
watermarked window aggregations."""
