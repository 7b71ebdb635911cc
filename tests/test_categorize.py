"""Branch-order parity with reference categorizer.py:1-32 and
transformer.py:17-25 — every category branch, genre precedence, the
space-padded ' rap ' keyword, and the trusted-source gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.functions.categorize import (
    categorize_event,
    categorize_with_trust_gate,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "name string, description string, venue string")
    cat, gen = categorize_event(F.col("name"), F.col("description"), F.col("venue"))
    out = df.select(cat.alias("category"), gen.alias("genre")).collect()
    return [(r.category, r.genre) for r in out]


def test_category_branch_order(spark):
    # 'fest' wins over comedy keywords appearing later in the text
    # (categorizer.py:6: festival checked first)
    rows = [
        ("Rock Fest with comedy night", None, None),
        ("Stand-up showcase", None, None),
        ("Broadway musical", None, None),
        ("Championship game", None, None),
        ("An evening of songs", None, None),
    ]
    got = _run(spark, rows)
    assert [g[0] for g in got] == ["festival", "comedy", "theater", "sports", "music"]


def test_genre_only_for_festival_and_music(spark):
    got = _run(
        spark,
        [
            ("Jazz Fest", None, None),  # festival → genre detected
            ("Comedy jam rock", None, None),  # comedy → genre None
            ("Quiet evening", None, None),  # music → 'general'
        ],
    )
    assert got[0] == ("festival", "jazz")
    assert got[1] == ("comedy", None)
    assert got[2] == ("music", "general")


def test_genre_precedence_insertion_order(spark):
    # country listed before rock (categorizer.py:18-19): text with both
    got = _run(spark, [("bluegrass and metal night", None, None)])
    assert got[0] == ("music", "country")


def test_rap_requires_space_padding(spark):
    # ' rap ' keyword (categorizer.py:24): 'wrap party' must NOT match
    got = _run(spark, [("wrap party", None, None), ("the rap show", None, None)])
    assert got[0] == ("music", "general")
    assert got[1] == ("music", "hip-hop")


def test_combined_includes_desc_and_venue(spark):
    got = _run(spark, [("Night out", "twang special", None),
                       ("Night out", None, "Symphony Hall")])
    assert got[0] == ("music", "country")
    assert got[1] == ("music", "classical")


def test_trust_gate(spark):
    df = spark.createDataFrame(
        [
            ("ticketmaster", "Sports", "g0", "jazz night", None, None),
            ("ticketmaster", None, None, "jazz night", None, None),
            ("underdog", "Sports", "g0", "jazz night", None, None),
            ("ticketmaster", "", None, "jazz night", None, None),
        ],
        "source string, category string, genre string, name string, "
        "description string, venue string",
    )
    cat, gen = categorize_with_trust_gate(
        F.col("source"), F.col("category"), F.col("genre"),
        F.col("name"), F.col("description"), F.col("venue"),
    )
    got = [(r.c, r.g) for r in df.select(cat.alias("c"), gen.alias("g")).collect()]
    # trusted + category present → kept; otherwise recategorized
    assert got[0] == ("Sports", "g0")
    assert got[1] == ("music", "jazz")
    assert got[2] == ("music", "jazz")
    assert got[3] == ("music", "jazz")  # '' counts as absent (falsy)
