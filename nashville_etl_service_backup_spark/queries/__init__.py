"""Query registry: every implemented operator from SURVEY.md §2 plus the
100-TB-pipeline extensions, each as a (spark, sf_dir) -> DataFrame callable
with a hash-matching DuckDB oracle SQL string.

Determinism contract (how every query is written so the driver's
row-count + schema + order-insensitive value-hash check passes):
- money/double SUMs go through DECIMAL(18,4|6) in BOTH engines — exact,
  summation-order-independent (Spark partial aggregation order varies);
- AVGs are decimal-sum / count, rounded, never native double avg;
- any LIMIT/top-k orders by a total order ending in a unique key;
- timestamps are returned as formatted strings (micros included);
- arrays are never returned (DuckDB list_distinct is unordered) —
  only scalars derived from them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nashville_etl_service_backup_spark.queries import (
    analytics,
    behavioral,
    etl_e2e,
    llmdata,
    serving_q,
    tpch,
    tpch2,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in (tpch, tpch2, analytics, behavioral, serving_q, llmdata, etl_e2e):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (tpch, tpch2, analytics, behavioral, serving_q, llmdata, etl_e2e):
        out.update(mod.ORACLES)
    return out
