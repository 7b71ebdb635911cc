"""Composite dataflow operators: serving query, pagination, dedup,
similarity search, text analysis."""

from __future__ import annotations

from pyspark.sql import DataFrame


# Persisted frames created inside operators (LSH/n-gram/embedding
# signature stages). Queries are lazy, so the operator cannot unpersist
# before its caller materializes the result; instead every persist is
# registered here and the caller (bench loop, long-running service,
# tests) calls release_persisted() once the result is consumed. Without
# this, each dedup query would leak its cached signature frame for the
# session's lifetime.
_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() + register for later release_persisted()."""
    df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every operator-cached frame; returns how many."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


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
