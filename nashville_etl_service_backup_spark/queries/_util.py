"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(c: Column, scale: int = 4) -> Column:
    """Exact, order-independent sum of a double expression: route through
    DECIMAL so Spark's partition-order-dependent double summation cannot
    produce run-to-run (or engine-to-engine) drift. Result cast back to
    double (exact for |value|*10^scale < 2^53)."""
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(c: Column, scale: int = 4, round_to: int = 6) -> Column:
    """Deterministic average = decimal-sum / count, rounded."""
    return F.round(dsum(c, scale) / F.count(F.lit(1)), round_to)


def fmt_ts(c: Column) -> Column:
    """Timestamp → string with microseconds; matches DuckDB
    strftime(..., '%Y-%m-%d %H:%M:%S.%f')."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def fmt_date(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd")


# DuckDB-side token pipeline matching functions/text.py::search_tokens /
# tokenize exactly (lower → non-alnum→space → split → drop empties).
DUCK_TOKENS_ORDERED = (
    "list_filter(string_split(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'),"
    " ' '), x -> x <> '')"
)
DUCK_TOKENS_DISTINCT = "list_distinct(" + DUCK_TOKENS_ORDERED + ")"
