"""Value hygiene & normalization — F5/F6/F10/F11 (SURVEY §2.8).

Reference: standardizer.py:50-66 (venue/price), transform_data.py:268-273
(_safe_float), transform_data.py:79,103,... (title-case '_' cleanup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_double(c: Column) -> Column:
    """F10 — cast-or-null; empty string is null too (transform_data.py:268-273).

    Spark's cast('double') is already null-on-failure; trim first so
    ' 36.1 ' parses like Python float() would.
    """
    trimmed = F.trim(c.cast("string"))
    # try_cast, not cast: ANSI mode (Spark 4 default) makes cast throw on
    # malformed input; the reference's semantics are null-on-failure.
    return F.when(trimmed == "", F.lit(None)).otherwise(trimmed).try_cast("double")


def standardize_venue_name(name: Column) -> Column:
    """F5 (standardizer.py:50-55): collapse whitespace, strip a trailing
    venue/hall/theater/theatre word (case-insensitive), title-case.

    Divergence note: reference uses Python str.title() which uppercases
    after ANY non-alpha ("mother's" → "Mother'S"); we use initcap
    (word-boundary = whitespace), the conventional SQL behavior.
    """
    collapsed = F.trim(F.regexp_replace(name, r"\s+", " "))
    stripped = F.regexp_replace(collapsed, r"(?i)\s+(venue|hall|theater|theatre)$", "")
    out = F.initcap(stripped)
    return F.when(name.isNull() | (F.trim(name) == ""), F.lit(None)).otherwise(out)


def standardize_price(price: Column) -> Column:
    """F6 (standardizer.py:57-66): 'free' anywhere → 0.0; else first
    integer/decimal token → double; else NULL. '' → NULL (falsy gate)."""
    p = price.cast("string")
    first_num = F.regexp_extract(p, r"\d+\.?\d*", 0)
    return (
        F.when(p.isNull() | (p == ""), F.lit(None).cast("double"))
        .when(F.lower(p).contains("free"), F.lit(0.0))
        .when(first_num != "", first_num.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def title_case_category(c: Column) -> Column:
    """F11: '_'→' ' then title-case (transform_data.py:79 etc.)."""
    return F.initcap(F.regexp_replace(c, "_", " "))


def clean_string(c: Column) -> Column:
    """P7 (document_spider.py:383-407): stringify, strip; ''/'nan'/'none'
    → NULL."""
    s = F.trim(c.cast("string"))
    return F.when(
        s.isNull() | (s == "") | F.lower(s).isin("nan", "none", "null"), F.lit(None)
    ).otherwise(s)
