"""Composite dataflow operators: serving query, pagination, dedup,
similarity search, text analysis."""
