"""Composite dataflow operators: serving query, pagination, dedup,
similarity search, text analysis."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism × factor`` before
    a CPU-heavy derivation (per-token md5, signature computation, media
    decode). Needed whenever the upstream scan yields fewer splits than
    cores — e.g. a single-row-group parquet file, which Spark cannot
    split (one task reads the whole row group while the rest idle). The
    shuffle moves only the skinny projected input once; at 100 TB the
    equivalent is a many-file scan, where this is a no-op by
    construction (input splits ≥ cores) but still harmless."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * factor)
