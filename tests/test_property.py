"""Property-based tests (hypothesis) for the scalar-function library and
the pagination/packing operators: the never-crash / total-function /
partition-invariant properties that example tests can't sweep.

Each example generates a WHOLE input batch and evaluates one Spark job
over it (examples are capped low — a Spark job per example is the cost
model here, and deadlines are disabled accordingly).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# strings that look vaguely like the wild inputs the reference sees:
# dates in several formats, junk, numbers, empty
_raw_text = st.one_of(
    st.text(max_size=30),
    st.sampled_from(
        [
            "2025-06-14T19:30:00Z",
            "June 14, 2025 7:30PM CDT",
            "6/14/2025",
            "Jun 14",
            "free entry",
            "$12.50-$20",
            "n/a",
            "",
            "  ",
            "TBD 2025",
        ]
    ),
)

_sources = st.sampled_from(
    ["ticketmaster", "seatgeek", "visitmusiccity-nashville.com", "underdog",
     "yelp", "csv_upload", "unknown", ""]
)


@SLOW
@given(st.lists(st.tuples(_raw_text, _sources), min_size=1, max_size=60))
def test_standardize_date_is_total(spark, rows):
    """standardize_date never raises and returns NULL or a string for
    ANY input; empty raw is always NULL (the reference's falsy gate —
    unparseable non-empty input passes through raw, standardizer.py:50)."""
    from nashville_etl_service_backup_spark.functions.dates import (
        standardize_date,
    )

    df = spark.createDataFrame(rows, "raw string, source string")
    out = df.select(
        "raw",
        standardize_date(F.col("raw"), F.col("source"), now_year=2025).alias("d"),
    ).collect()
    for r in out:
        assert r["d"] is None or isinstance(r["d"], str)
        if r["raw"] == "":
            assert r["d"] is None


@SLOW
@given(st.lists(_raw_text, min_size=1, max_size=60))
def test_standardize_price_is_total_and_nonnegative(spark, rows):
    """standardize_price: NULL or a finite non-negative double, for any
    string (the first-number regex can never produce a negative)."""
    from nashville_etl_service_backup_spark.functions.cleaning import (
        standardize_price,
    )

    df = spark.createDataFrame([(r,) for r in rows], "p string")
    for r in df.select(standardize_price(F.col("p")).alias("v")).collect():
        if r["v"] is not None:
            assert math.isfinite(r["v"]) and r["v"] >= 0.0


@SLOW
@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=80),
)
def test_paginate_partitions_the_ordered_stream(spark, page, per_page, n_rows):
    """Page p of the paginated stream == rows[lo:hi] of the full ordered
    stream, for any page/per_page/corpus size (incl. past-the-end)."""
    from nashville_etl_service_backup_spark.operators.pagination import (
        paginate,
    )

    df = spark.range(n_rows).select(
        (F.col("id") * 37 % 100).alias("k"), F.col("id").alias("uid")
    )
    order = [F.asc("k"), F.asc("uid")]
    full = [
        (r["k"], r["uid"])
        for r in df.orderBy(*order).collect()
    ]
    got = [
        (r["k"], r["uid"])
        for r in paginate(df, order, page=page, per_page=per_page)
        .orderBy(*order)
        .collect()
    ]
    lo, hi = (page - 1) * per_page, page * per_page
    assert got == full[lo:hi]


@SLOW
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=200),
)
def test_pack_offsets_contiguity(spark, token_counts, budget):
    """Within a stream: offsets start at 0, advance by exactly the
    previous doc's token count, and pack_id is the start-offset chunk."""
    from nashville_etl_service_backup_spark.operators.text_analysis import (
        pack_offsets,
    )

    rows = [(i, "w " * n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (
            (r["stream"], r["doc_id"], r["n_tokens"], r["start_offset"], r["pack_id"])
            for r in pack_offsets(
                df, "doc_id", "text", budget=budget, n_streams=3
            ).collect()
        )
    )
    per_stream: dict = {}
    for stream, _doc, nt, off, pack in out:
        expected = per_stream.get(stream, 0)
        assert off == expected
        assert pack == off // budget
        per_stream[stream] = expected + nt
