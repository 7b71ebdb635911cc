"""Serving query (reference §3.3): filters, AND-search + rank order,
deterministic pagination, distinct dims, count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.operators.pagination import paginate
from nashville_etl_service_backup_spark.operators.serving import (
    count_with_filters,
    distinct_values,
    query_events,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # name, url, event_date, venue_name, venue_address, description,
        # source, category
        ("Jazz Night", "u1", "2025-01-02T20:00:00", "Ryman", "1 Main",
         "smooth jazz", "Ticketmaster", "Music"),
        ("Rock Show", "u2", "2025-01-01T20:00:00", "Exit In", "2 Main",
         "loud rock", "Ticketmaster", "Music"),
        ("Food Fest", "u3", "2025-01-03T11:00:00", "Park", "3 Main",
         "street food and jazz", "Yelp", "Festival"),
        ("Art Walk", "u4", None, "Gallery", "4 Main",
         "paintings", "Yelp", "Art"),
    ]
    return spark.createDataFrame(
        rows,
        "name string, url string, event_date string, venue_name string, "
        "venue_address string, description string, source string, "
        "category string",
    )


def test_browse_order_nulls_last(events):
    out = query_events(events).collect()
    assert [r.url for r in out] == ["u2", "u1", "u3", "u4"]


def test_source_and_category_filters(events):
    out = query_events(events, source="Ticketmaster").collect()
    assert {r.url for r in out} == {"u1", "u2"}
    out = query_events(events, source="Yelp", category="Festival").collect()
    assert [r.url for r in out] == ["u3"]


def test_search_and_semantics_and_rank(events):
    # AND semantics: both terms must be present
    out = query_events(events, search="jazz food").collect()
    assert [r.url for r in out] == ["u3"]
    # rank: u1 has fewer tokens → higher overlap ratio than u3
    out = query_events(events, search="jazz").collect()
    assert out[0].url == "u1" and {r.url for r in out} == {"u1", "u3"}
    assert out[0].score >= out[1].score


def test_pagination_deterministic(events):
    p1 = query_events(events, page=1, per_page=2).collect()
    p2 = query_events(events, page=2, per_page=2).collect()
    assert [r.url for r in p1] == ["u2", "u1"]
    assert [r.url for r in p2] == ["u3", "u4"]
    p3 = query_events(events, page=3, per_page=2).collect()
    assert p3 == []


def test_distinct_and_count(events):
    dims = [r.source for r in distinct_values(events, "source").collect()]
    assert dims == ["Ticketmaster", "Yelp"]
    total = count_with_filters(events, source="Yelp").collect()[0].total
    assert total == 2


def test_paginate_keep_row_number(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    page = paginate(df, [F.asc("k")], page=2, per_page=3, keep_row_number=True)
    rows = page.collect()
    assert [(r.k, r.row_num) for r in rows] == [(3, 4), (4, 5), (5, 6)]


def test_search_topk_posting_matches_scan_plan(spark):
    """The posting-list serving search and the token-array-scan path
    are two physical plans for ONE score definition — identical rows,
    identical round-6 doubles, on a corpus with ties, partial matches,
    and an empty document."""
    from nashville_etl_service_backup_spark.functions.text import (
        query_tokens,
        search_tokens,
        text_match,
        text_rank,
    )
    from nashville_etl_service_backup_spark.operators.serving import (
        search_topk_posting,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark join window fast", "en"),
            (2, "spark spark join window window join", "en"),  # dups collapse
            (3, "join window only", "en"),  # partial: no 'spark'
            (4, "window spark join extra words here to dilute", "de"),
            (5, "", "en"),  # empty
            (6, "spark join window", "fr"),  # tie score with 1? 3/4 vs 3/3
        ],
        "doc_id long, text string, lang string",
    )
    got = search_topk_posting(
        docs, ["spark", "join", "window"], k=10,
        id_col="doc_id", extra_cols=("lang",), text_col="text",
    ).collect()
    toks = search_tokens(F.col("text"))
    q = query_tokens("spark join window")
    want = (
        docs.withColumn("_toks", toks)
        .filter(text_match(F.col("_toks"), q))
        .withColumn("score", F.round(text_rank(F.col("_toks"), q), 6))
        .select("doc_id", "lang", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(r["doc_id"] != 3 and r["doc_id"] != 5 for r in got)
