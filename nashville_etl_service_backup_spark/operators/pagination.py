"""Deterministic LIMIT/OFFSET pagination — O3 (db_extractor.py:18,53-57).

Top-k first, number second: `orderBy(...).limit(page*per_page)` plans as
TakeOrderedAndProject — a per-partition heap of at most page*per_page rows
merged on the driver side of the exchange, never a global sort — and only
then `row_number` over the (≤ page*per_page row) survivors to apply the
OFFSET. The caller MUST include a unique tiebreak column in `order_by` so
the total order (and therefore the page contents) is deterministic.

At 100 TB the pre-limit window variant is the classic scale-killer (every
surviving row moves to ONE task to be numbered); this shape touches only
k rows past the scan. Deep OFFSETs still pay O(page*per_page) — for a
true deep-paging API use key-set pagination (filter on last-seen key)
instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PER_PAGE = 25  # app.py:10; db_extractor.py:6


def paginate(
    df: DataFrame,
    order_by: list[Column],
    page: int = 1,
    per_page: int = PER_PAGE,
    keep_row_number: bool = False,
) -> DataFrame:
    lo = (page - 1) * per_page
    hi = page * per_page
    # TakeOrderedAndProject: per-partition top-hi heaps, no global sort.
    top = df.orderBy(*order_by).limit(hi)
    # Numbering runs over ≤ hi rows — the single-partition window is on a
    # page-sized frame, not the table.
    w = Window.orderBy(*order_by)
    out = top.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > lo)
    if keep_row_number:
        return out.withColumnRenamed("_rn", "row_num")
    return out.drop("_rn")


def page_count(total: Column, per_page: int = PER_PAGE) -> Column:
    """A5 (db_extractor.py:50): ceil(total/per_page)."""
    return F.ceil(total / F.lit(per_page)).cast("long")


def pagination_links(
    current_page: Column, total_pages: Column, max_visible: int = 5
) -> Column:
    """F23 (app.py:35-50): the windowed page-link range with
    first/last/ellipsis flags, as one struct-valued scalar expression
    (`sequence` + `greatest`/`least` — a UI scalar demo, per SURVEY
    §2.8)."""
    start0 = F.greatest(F.lit(1), current_page - max_visible // 2)
    end = F.least(total_pages, start0 + F.lit(max_visible - 1))
    start = F.when(
        end - start0 + 1 < max_visible,
        F.greatest(F.lit(1), end - F.lit(max_visible - 1)),
    ).otherwise(start0)
    return F.struct(
        (start > 1).alias("show_first"),
        (end < total_pages).alias("show_last"),
        (start > 2).alias("show_left_ellipsis"),
        (end < total_pages - 1).alias("show_right_ellipsis"),
        F.sequence(start.cast("int"), end.cast("int")).alias("pages"),
    )
