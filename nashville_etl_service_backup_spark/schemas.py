"""Canonical schemas and per-source raw JSON schemas.

Derived from the reference data model (SURVEY.md §1):
- curated ``events`` table: reference init.sql:6-21 (13 columns + derived
  search vector), plus the transform-layer ``price`` (standardizer.py:57-66)
  that never reached the reference's DDL.
- raw staging zone: reference init.sql:1-5.
- CSV/Excel/Word synonym column map: reference document_spider.py:25-33.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Bronze: append-only raw zone (init.sql:1-5; written by pipelines.py:11-21)
RAW_ZONE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("source_spider", T.StringType(), False),
        T.StructField("raw_json", T.StringType(), False),
    ]
)

# Silver: curated events (init.sql:6-21 + implicit price)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("url", T.StringType(), False),  # dedup key (init.sql:9)
        T.StructField("event_date", T.StringType(), True),  # ISO-8601 string
        T.StructField("venue_name", T.StringType(), True),
        T.StructField("venue_address", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("genre", T.StringType(), True),
        T.StructField("season", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("price", T.DoubleType(), True),
    ]
)

EVENT_FIELDS = [f.name for f in EVENTS_SCHEMA.fields]

# Per-source raw_json payload schema: all sources serialize BusinessItem-shaped
# dicts (items.py:13-28) — strings throughout, numerics as strings to exercise
# the null-on-failure casts (transform_data.py:62-70,268-273).
RAW_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(f, T.StringType(), True)
        for f in (
            "name",
            "url",
            "description",
            "source",
            "neighborhood",
            "event_id",
            "venue_name",
            "venue_city",
            "venue_address",
            "event_date",
            "category",
            "genre",
            "season",
            "latitude",
            "longitude",
            "price",
        )
    ]
)

# Text-payload shape routed to the AI/rule-based extractor
# (transform_data.py:239-241,398: detected by {'text','original_filepath'})
RAW_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("original_filepath", T.StringType(), True),
    ]
)

# Synonym → canonical column map (document_spider.py:25-33), applied after
# lower-casing headers (document_spider.py:277-301).
COLUMN_MAPPINGS: dict[str, list[str]] = {
    "name": ["name", "event_name", "title", "event", "business_name"],
    "url": ["url", "link", "website", "web", "site"],
    "venue_name": ["venue_name", "venue", "location", "place"],
    "venue_address": ["venue_address", "address", "street", "street_address"],
    "event_date": ["event_date", "date", "datetime", "when", "event_time", "time"],
    "description": ["description", "desc", "details", "info", "about"],
    "category": ["category", "type", "event_type", "kind"],
    "genre": ["genre", "music_genre", "style"],
    "venue_city": ["venue_city", "city", "town"],
    "latitude": ["latitude", "lat"],
    "longitude": ["longitude", "lng", "lon", "long"],
    "neighborhood": ["neighborhood", "area", "district"],
    "season": ["season"],
    "price": ["price", "cost", "fee", "ticket_price"],
}

SYNONYM_TO_CANONICAL: dict[str, str] = {
    syn: canon for canon, syns in COLUMN_MAPPINGS.items() for syn in syns
}

# Generic-spider source_spider → display label (transform_data.py:162-166),
# passthrough default
GENERIC_SOURCE_DISPLAY: dict[str, str] = {
    "nashville.com-events": "Nashville Events",
    "nashville.com-hotels": "Nashville Hotels",
    "underdog": "Underdog Venue",
}
