"""Time-series join operators the reference lacks but the target engine
needs (SURVEY §2.4 flags hash/sort-merge/theta/range/as-of joins as
"provided free by df.join" — as-of is NOT free and gets a dedicated
scale-correct composition here).

- asof_join: backward-inclusive as-of (each left row picks the latest
  right row with right_ts <= left_ts per key). Implemented as the
  union + keyed-window "last non-null payload" pattern: ONE shuffle on
  the key, no range self-join, no per-key collect — at 100 TB this is
  a single sort-merge per key partition, the same shape Flink/kdb use
  for as-of. A join-then-max formulation would shuffle the (left ×
  matching right) blow-up; this never materializes more than
  |left| + |right| rows.
- range_join_agg: per-left-row aggregate over right rows in a keyed
  time interval (equi-join on key + range predicate). Spark executes
  the equi part as a hash/sort-merge join and applies the band filter
  inside the join — candidate pairs are bounded per key, never a
  cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Backward-inclusive as-of join.

    ``right`` must be unique per (keys, right_ts) — pre-aggregate ties
    (e.g. ``groupBy(keys, ts).agg(max(struct(...)))``) so the match is
    deterministic; with ties intact the window would pick an arbitrary
    sort-stable row.

    Returns all ``left`` columns plus ``payload_cols`` from the matched
    right row (NULLs when ``how='left'`` and no right row precedes;
    ``how='inner'`` drops those rows).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"unsupported how={how!r}")
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        pay.alias("_pay"),
        F.lit(0).alias("_side"),
    )
    l = (
        left.withColumn("_t", F.col(left_ts))
        .withColumn("_pay", F.lit(None).cast(r.schema["_pay"].dataType))
        .withColumn("_side", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (_side=0) sort before left rows at equal _t → inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    return out


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    aggs: list[Column],
    group_cols: list[str],
) -> DataFrame:
    """Left range-join + per-left-row aggregation: for each left row,
    aggregate right rows of the same key with right_ts in
    (left_ts - lower, left_ts + upper]-style bands (the caller supplies
    the band predicates as ``lower <= right_ts`` boundaries via the
    ``lower``/``upper`` Column expressions over ``_lt``/``_rt``).

    Left rows with no right matches survive with NULL/0 aggregates
    (left join), so the result has exactly one row per left group.
    """
    lt = left.select(
        *[F.col(c) for c in group_cols],
        *[F.col(k).alias(f"_lk_{k}") for k in keys],
        F.col(left_ts).alias("_lt"),
    )
    rt = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        F.col(right_ts).alias("_rt"),
        *[c for c in right.columns if c not in keys and c != right_ts],
    )
    cond = lower & upper
    for k in keys:
        cond = cond & (F.col(f"_lk_{k}") == F.col(f"_rk_{k}"))
    return (
        lt.join(rt, cond, "left")
        .groupBy(*group_cols)
        .agg(*aggs)
    )
