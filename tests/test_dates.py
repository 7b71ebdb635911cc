"""standardize_date parity with reference standardizer.py:4-49 — ISO,
nashville.com (current-year injection), underdog (tz map), yelp-null and
passthrough branches; offsets cross-checked against pytz."""

from __future__ import annotations

from datetime import datetime

import pytest
import pytz
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.functions.dates import (
    display_date,
    season_label,
    standardize_date,
)


def _std(spark, rows, now_year=2025):
    df = spark.createDataFrame(rows, "raw string, source string")
    out = df.select(
        standardize_date(F.col("raw"), F.col("source"), now_year=now_year).alias("d")
    ).collect()
    return [r.d for r in out]


def _pytz_iso(y, mo, d, h, mi, tz):
    return pytz.timezone(tz).localize(datetime(y, mo, d, h, mi)).isoformat()


def test_iso_branch(spark):
    got = _std(
        spark,
        [
            ("2025-06-14 19:30:00", "ticketmaster"),
            ("2025-06-14T19:30:00", "seatgeek"),
            ("garbage", "ticketmaster"),  # unparseable → raw passthrough
        ],
    )
    assert got[0] == "2025-06-14T19:30:00"
    assert got[1] == "2025-06-14T19:30:00"
    assert got[2] == "garbage"


def test_nashville_branch_injects_year_and_localizes(spark):
    got = _std(spark, [("October 2 @ 8:00 pm", "nashville.com-events")], now_year=2025)
    assert got[0] == _pytz_iso(2025, 10, 2, 20, 0, "America/Chicago")
    # CDT on Oct 2 → -05:00
    assert got[0].endswith("-05:00")


def test_nashville_unmatched_passthrough(spark):
    got = _std(spark, [("every sunday", "nashville.com-hotels")])
    assert got[0] == "every sunday"


def test_underdog_branch_tz_map(spark):
    got = _std(
        spark,
        [
            ("June 14, 2025 | 7:30PM CDT", "underdog"),
            ("June 14, 2025 | 7PM EST", "underdog"),
            ("January 10, 2025 | 7:30PM CST", "underdog"),
            ("not a date", "underdog"),  # error → NULL (standardizer.py:44-46)
        ],
    )
    assert got[0] == _pytz_iso(2025, 6, 14, 19, 30, "America/Chicago")
    assert got[1] == _pytz_iso(2025, 6, 14, 19, 0, "America/New_York")
    assert got[2] == _pytz_iso(2025, 1, 10, 19, 30, "America/Chicago")
    assert got[2].endswith("-06:00")  # CST in January
    assert got[3] is None


def test_yelp_null_and_passthrough(spark):
    got = _std(spark, [("whenever", "yelp"), ("2025-01-01", "unknown_src")])
    assert got[0] is None
    assert got[1] == "2025-01-01"


def test_empty_is_null(spark):
    got = _std(spark, [("", "ticketmaster"), (None, "underdog")])
    assert got == [None, None]


def test_display_date(spark):
    df = spark.createDataFrame([("2025-06-14T19:30:00",)], "iso string")
    got = df.select(display_date(F.col("iso")).alias("d")).collect()[0].d
    assert got == "Jun 14, 2025 at 07:30 PM"


def test_season_label(spark):
    df = spark.createDataFrame([("2025-10-02 00:00:00",)], "t string")
    got = df.select(
        season_label(F.to_timestamp("t")).alias("s")
    ).collect()[0].s
    assert got == "Fall 2025"


def test_pandas_udf_date_fallback(spark):
    from nashville_etl_service_backup_spark.functions.dates import (
        parse_dates_pandas_udf,
    )
    from pyspark.sql import functions as F

    udf = parse_dates_pandas_udf()
    df = spark.createDataFrame(
        [("2025-06-01 19:30:00",), ("June 01 2025 07:30 PM",), ("03/15/2025",),
         ("not a date",), (None,)],
        "raw string",
    )
    got = [r["iso"] for r in df.select(udf(F.col("raw")).alias("iso")).collect()]
    assert got == [
        "2025-06-01T19:30:00",
        "2025-06-01T19:30:00",
        "2025-03-15T00:00:00",
        None,
        None,
    ]
