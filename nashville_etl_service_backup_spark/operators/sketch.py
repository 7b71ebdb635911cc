"""Count-min sketch as a DataFrame aggregation.

The CMS (Cormode & Muthukrishnan 2005, "An improved data stream summary:
the count-min sketch and its applications") is the classic mergeable
frequency sketch: depth×width counters, item increments one counter per
row via independent hashes, point estimate = min over its counters
(always an overcount, never an undercount).

Spark-first shape: the counter table IS a DataFrame — build is one
explode (depth rows per input row, carrying only (row_idx, bucket)) +
one map-side-combinable groupBy count; merging sketches is a union +
re-aggregate (counters form a commutative monoid), so it distributes
and streams for free. Hashes are md5-derived (first 8 hex chars →
bigint), deterministic and engine-portable — the DuckDB oracle derives
the identical counters, unlike the engine-internal HLL/t-digest
sketches (q_approx_* are rows-only for that reason; this one
hash-matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row_idx: int, width: int) -> Column:
    """Row-seeded md5 bucket in [0, width): first 8 hex chars of
    md5('<row>:<key>') as an integer, mod width."""
    h = F.md5(F.concat(F.lit(f"{row_idx}:"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _row_buckets(key: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                _bucket(key, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the counter table (row_idx, bucket, cnt). Only non-zero
    counters materialize — at most depth × width rows after the one
    combinable shuffle, regardless of input size."""
    key = F.col(key_col).cast("string")
    return (
        df.select(F.explode(_row_buckets(key, depth, width)).alias("rb"))
        .groupBy(
            F.col("rb.row_idx").alias("row_idx"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union + re-aggregate: counters are a commutative monoid, so
    per-partition / per-day sketches combine exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for each key in `keys`: min over the key's depth
    counters (absent counter = 0). The sketch side is ≤ depth × width
    rows, so the join broadcasts; the probe never scans the raw data."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(_row_buckets(key, depth, width)).alias("rb"),
    )
    joined = probes.join(
        F.broadcast(cms),
        (probes["rb.row_idx"] == cms["row_idx"])
        & (probes["rb.bucket"] == cms["bucket"]),
        "left",
    )
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )
