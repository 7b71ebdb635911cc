"""Skew-safe grouped rankings.

A plain per-group top-k (`row_number over (partition by g order by ...)
<= k`) sorts EVERY row of a group inside one task — at 100 TB a hot key
(one domain, one language, one brand) serializes the whole stage behind
a single straggler. The standard fix is the two-phase salted plan: rank
within (group, salt) first and keep k per slice, then rank the
≤ k·salt_buckets survivors per group. The result is IDENTICAL to the
one-window form — a group's true top-k rows each rank ≤ k inside
whatever slice they landed in, so phase 1 never drops them — but no
task ever sorts more than |group| / salt_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_col: Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """Top-``k`` rows per group under ``order_by`` via the salted
    two-phase plan (see module doc). ``order_by`` must be a TOTAL order
    (end it with a unique key) so phases — and engines — agree on ties;
    ``salt_col`` should be a roughly uniform expression (an id column).
    Output adds ``rn`` (1-based final rank within the group)."""
    salt = F.conv(
        F.substring(F.md5(salt_col.cast("string")), 1, 8), 16, 10
    ).cast("long") % salt_buckets
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rn", F.row_number().over(w2).cast("long"))
        .filter(F.col("rn") <= k)
        .drop("_salt", "_r1")
    )
