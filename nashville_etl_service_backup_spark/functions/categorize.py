"""Keyword categorization — reference categorizer.py:1-32 and the
trusted-source gate transformer.py:17-25 (F7/F8/F9 in SURVEY §2.8).

Pure `when`-cascade Column expressions; branch ORDER is semantic (first
match wins, both across categories and across genres) and is preserved
exactly, including the space-padded ' rap ' / ' trap ' keywords.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference categorizer.py:5-13 — category → keyword list, ordered
CATEGORY_KEYWORDS: list[tuple[str, list[str]]] = [
    ("festival", ["fest", "festival"]),
    ("comedy", ["comedy", "comedian", "stand-up", "standup"]),
    ("theater", ["theater", "theatre", "play", "musical", "broadway"]),
    ("sports", ["game", "match", "tournament", "sports"]),
]

# reference categorizer.py:18-28 — genre → keywords, insertion order matters
GENRE_KEYWORDS: list[tuple[str, list[str]]] = [
    ("country", ["country", "honky tonk", "twang", "bluegrass", "americana"]),
    ("rock", ["rock", "punk", "metal", "alternative", "indie rock"]),
    ("jazz", ["jazz", "swing", "bebop"]),
    ("blues", ["blues", "rhythm and blues", "r&b"]),
    ("electronic", ["electronic", "edm", "house", "techno", "dubstep"]),
    ("hip-hop", ["hip hop", "hip-hop", " rap ", " trap "]),
    ("folk", ["folk", "acoustic", "singer-songwriter"]),
    ("pop", ["pop", "top 40"]),
    ("classical", ["classical", "orchestra", "symphony"]),
]

# genre is only attached for festival/music (categorizer.py:6-14)
_GENRE_CATEGORIES = {"festival", "music"}


def _combined(name: Column, description: Column, venue: Column) -> Column:
    """lower(name) + ' ' + lower(desc) + ' ' + lower(venue), nulls → ''
    (reference categorizer.py:2-4: f-string over lowered-or-empty parts)."""
    parts = [F.coalesce(F.lower(c), F.lit("")) for c in (name, description, venue)]
    return F.concat_ws(" ", *parts)


def _any_contains(text: Column, keywords: list[str]) -> Column:
    cond = text.contains(keywords[0])
    for kw in keywords[1:]:
        cond = cond | text.contains(kw)
    return cond


def detect_genre(text: Column) -> Column:
    """First-match genre over an already-combined lowered text
    (categorizer.py:17-32); 'general' fallback. Built as ONE flat
    CaseWhen (not nested otherwise-chains) — nested CaseWhens blow up
    whole-stage-codegen method size."""
    expr = None
    for genre, kws in GENRE_KEYWORDS:
        cond = _any_contains(text, kws)
        expr = F.when(cond, F.lit(genre)) if expr is None else expr.when(cond, F.lit(genre))
    return expr.otherwise(F.lit("general"))


def categorize_event(
    name: Column, description: Column | None = None, venue: Column | None = None,
    combined: Column | None = None,
) -> tuple[Column, Column]:
    """Returns (category, genre) Columns (categorizer.py:1-14).

    genre is NULL for comedy/theater/sports, detect_genre(...) for
    festival/music — exactly the reference's tuple contract. The genre
    gate is expressed directly on the keyword predicates (festival
    matched, or nothing matched → category 'music') instead of
    re-embedding the whole category cascade, keeping generated code
    small.

    ``combined`` lets the caller pass an already-STAGED
    lower(name)+desc+venue column: the cascade references it ~40 times
    (one per keyword contains), and codegen's subexpression elimination
    does not reach across when-branches, so without staging the
    lower+concat is re-evaluated per keyword (the same round-2 staging
    device as etl_e2e._raw_zone; A/B in BENCH_ISOLATIONS_r09).
    """
    description = description if description is not None else F.lit(None)
    venue = venue if venue is not None else F.lit(None)
    if combined is None:
        combined = _combined(name, description, venue)

    conds = [(cat, _any_contains(combined, kws)) for cat, kws in CATEGORY_KEYWORDS]
    category = None
    for cat, cond in conds:
        category = (
            F.when(cond, F.lit(cat)) if category is None else category.when(cond, F.lit(cat))
        )
    category = category.otherwise(F.lit("music"))

    by_cat = dict(conds)
    genre_on = by_cat["festival"] | ~(
        by_cat["comedy"] | by_cat["theater"] | by_cat["sports"]
    )
    genre = F.when(genre_on, detect_genre(combined)).otherwise(
        F.lit(None).cast("string")
    )
    return category, genre


# reference transformer.py:20 — sources whose category is authoritative
TRUSTED_SOURCES = ("nashville_arcgis", "ticketmaster", "yelp", "google_places")


def categorize_with_trust_gate(
    source: Column,
    existing_category: Column,
    existing_genre: Column,
    name: Column,
    description: Column | None = None,
    venue: Column | None = None,
    combined: Column | None = None,
) -> tuple[Column, Column]:
    """F9 (transformer.py:17-25): recategorize unless the source is trusted
    AND a category is already present ('' counts as absent)."""
    cat, gen = categorize_event(name, description, venue, combined=combined)
    keep = source.isin(*TRUSTED_SOURCES) & existing_category.isNotNull() & (
        existing_category != F.lit("")
    )
    return (
        F.when(keep, existing_category).otherwise(cat),
        F.when(keep, existing_genre).otherwise(gen),
    )
