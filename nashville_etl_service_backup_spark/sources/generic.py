"""Config-driven generic source semantics — S9/S10/J1 (SURVEY §2.1/§2.4).

The reference's generic spider (generic_spider.py:30-90) walks
`sites.json`: CSS/XPath extraction per site, static `defaults` per item,
a `name_filter_out` substring exclusion, URL absolutization, and an
optional detail-page follow whose extracted fields are merged onto the
list-page record (the system's only enrichment join). HTML fetching and
selector evaluation are crawler concerns (out-of-engine, SURVEY S9);
this module implements the ENGINE side over the extracted-record drop
(a DataFrame of per-site rows, e.g. `spark.read.json` of the crawl
output):

- `apply_site_config`: source/category labels, defaults merge
  (extracted value wins only when non-empty — the reference sets
  defaults first and overwrites on truthy data, generic_spider.py:52-57),
  `name_filter_out` (substring, case-sensitive, :42-44), URL
  absolutization (:60,69 — F19).
- `enrich_with_details`: J1 (generic_spider.py:58-77) — left join on
  url; on a matched detail row every configured detail field OVERWRITES
  the list value, including with NULL when the detail page lacked it
  (parse_details sets `None` on missing, :71-77). Unmatched rows keep
  list values. Broadcast the detail side when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.functions.text import absolutize_url


def apply_site_config(
    df: DataFrame,
    source: str,
    category: str | None = None,
    defaults: dict[str, str] | None = None,
    name_filter_out: str | None = None,
    base_url: str | None = None,
) -> DataFrame:
    """S9 engine-side semantics for one site's extracted records."""
    out = df.withColumn("source", F.lit(source))
    if category is not None:
        out = out.withColumn("category", F.lit(category))
    for field, value in (defaults or {}).items():
        col = (
            F.col(field) if field in out.columns else F.lit(None).cast("string")
        )
        out = out.withColumn(field, F.coalesce(F.nullif(col, F.lit("")), F.lit(value)))
    if name_filter_out:
        out = out.filter(
            F.col("name").isNull() | ~F.col("name").contains(name_filter_out)
        )
    if base_url:
        out = out.withColumn("url", absolutize_url(F.col("url"), base_url))
    return out


def enrich_with_details(
    list_df: DataFrame,
    detail_df: DataFrame,
    detail_fields: list[str],
    key: str = "url",
    broadcast_details: bool = True,
) -> DataFrame:
    """J1: merge detail-page fields onto list-page records by followed
    URL (left-outer 1:1). Matched detail rows overwrite every configured
    field — even with NULL — mirroring parse_details; unmatched rows
    pass through."""
    d = detail_df.select(
        F.col(key).alias("_d_key"),
        F.lit(True).alias("_d_matched"),
        *[F.col(c).alias(f"_d_{c}") for c in detail_fields],
    )
    if broadcast_details:
        d = F.broadcast(d)
    joined = list_df.join(d, list_df[key] == d["_d_key"], "left")
    out = joined
    for c in detail_fields:
        base = (
            F.col(c) if c in list_df.columns else F.lit(None).cast("string")
        )
        out = out.withColumn(
            c,
            F.when(F.coalesce(F.col("_d_matched"), F.lit(False)), F.col(f"_d_{c}"))
            .otherwise(base),
        )
    return out.drop("_d_key", "_d_matched", *[f"_d_{c}" for c in detail_fields])
