"""Ingestion sources: CSV/JSON with synonym normalization, rule-based and
LLM text extraction, binary document plumbing, REST connector
scaffolding with request-side pushdown."""
