"""Analytic-function coverage wave: lag/lead/ntile windows, exact
interpolated percentiles, CUBE grouping sets, and approximate distinct
counting (HLL — intentionally rows-only: sketch estimates are
engine-internal; accuracy is asserted against the exact count in
tests/test_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nashville_etl_service_backup_spark.queries._util import dsum
from nashville_etl_service_backup_spark.tables import load


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD/NTILE over each user's event timeline (§2.9 gap:
    analytic offsets). One shuffle on user_id serves all three window
    functions (same partitioning + ordering). Gap emitted in exact
    integer microseconds — no float time math."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (us - F.lag(us).over(w)).alias("gap_micros"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p50/p95) of order totals per
    priority — Spark `percentile` and DuckDB `quantile_cont` share the
    index = p·(n−1) linear-interpolation definition, so values match to
    rounding. At scale the exact percentile is a per-group sort;
    approx_percentile (t-digest) is the sketch alternative."""
    orders = load(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.lit([0.25, 0.5, 0.95]))
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.element_at(pct, 1), 6).alias("p25"),
        F.round(F.element_at(pct, 2), 6).alias("p50"),
        F.round(F.element_at(pct, 3), 6).alias("p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of returnflag × linestatus)
    with GROUPING() disambiguation — complements q_rollup_order_priority
    (§2.5 gap)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
            "g_flag",
            "g_status",
        )
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per return flag (rows-only
    check by design: the estimate is engine-internal; relative error vs
    the exact count is pinned in tests). The 100 TB shape: one narrow
    pass + tiny sketch merge, no distinct shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


QUERIES = {
    "q_lag_lead": q_lag_lead,
    "q_percentiles": q_percentiles,
    "q_cube_returns": q_cube_returns,
    "q_approx_distinct": q_approx_distinct,
}

ORACLES = {
    "q_lag_lead": """
SELECT event_id, user_id,
  LAG(event_id) OVER w AS prev_event_id,
  LEAD(event_id) OVER w AS next_event_id,
  epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_micros,
  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    "q_percentiles": """
SELECT o_orderpriority,
  ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
  ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    "q_cube_returns": """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    # q_approx_distinct: intentionally no oracle (rows-only) — HLL
    # estimates are engine-internal; accuracy pinned in tests.
}
