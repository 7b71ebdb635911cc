"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nashville_etl_service_backup_spark``
(see SURVEY.md §2 for the operator inventory each query maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nashville_etl_service_backup_spark import queries as _q
from nashville_etl_service_backup_spark.session import tune_for_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's serving query (SURVEY §3.3) — full-text
    search + relevance rank + top-k over `documents` at sf0.001."""
    tune_for_session(spark)
    return _q.serving_q.q_doc_search_rank(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    dedup/similarity/text-analysis extensions)."""
    qs = _q.all_queries()

    def _wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query. Since round 3 every
    registry entry has one (a key missing here would get the weaker
    rows-only check; none do)."""
    return _q.all_oracles()
