"""Raw zone → canonical events: the reference's entire transform stage
(transform_data.py:505-556) as ONE lazy DataFrame plan.

The reference loops over every staging row in Python, dispatching to a
per-source transformer function (transform_data.py:526-544). Here each
source's projection is a `from_json` + `select` branch filtered by the
same dispatch predicate (including the prefix/substring rules), unioned
with `unionByName` — Catalyst fuses the branches into a single pass and
the per-row Python loop becomes a distributed narrow map.

Per-source semantics ported exactly (defaults, title-casing, validity
gates):
- arcgis        transform_data.py:58-88   (name+venue gate, 'Civic Facility')
- ticketmaster  transform_data.py:91-111  (name+venue gate, 'Event')
- yelp          transform_data.py:114-133 (name gate, 'Business', venue=name)
- google_places transform_data.py:136-154 (name gate, 'Attraction', venue=name)
- generic       transform_data.py:157-184 (name gate, 'General', source map)
- seatgeek      transform_data.py:187-206 (name+venue gate, 'Event')
- document      transform_data.py:244-265 (name gate, 'Document Extracted',
                venue coalesces to name, file-type in display source)
- pdf           transform_data.py:484-502 (name+url gate, 'Pdf Extracted')
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.functions.categorize import (
    categorize_with_trust_gate,
)
from nashville_etl_service_backup_spark.functions.cleaning import (
    safe_double,
    standardize_price,
    standardize_venue_name,
)
from nashville_etl_service_backup_spark.functions.dates import standardize_date
from nashville_etl_service_backup_spark.schemas import (
    EVENT_FIELDS,
    GENERIC_SOURCE_DISPLAY,
    RAW_ITEM_SCHEMA,
)


def _title(c: Column) -> Column:
    """Python str.title() analog for category values (divergence: initcap
    word-splits on whitespace only; see cleaning.standardize_venue_name)."""
    return F.initcap(c)


def _nonempty(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def _parsed(raw: DataFrame) -> DataFrame:
    """Parse raw_json once; all source branches share this projection.

    Persisted because the 8 dispatch branches each re-read their input:
    without the cache the raw construction + JSON parse would re-execute
    per branch (8× the scan). Callers control input partitioning — pass
    an already-spread raw frame so the parse and every branch run on all
    cores (see operators.spread)."""
    return raw.select(
        "source_spider",
        F.from_json("raw_json", RAW_ITEM_SCHEMA).alias("r"),
    ).persist()


def _common(
    parsed: DataFrame,
    source: Column,
    *,
    venue_name: Column | None = None,
    category_default: str,
    category_underscores: bool = False,
    event_date: Column | None = None,
    require_venue: bool = False,
    require_url: bool = False,
) -> DataFrame:
    r = F.col("r")
    cat_raw = F.coalesce(r["category"], F.lit(category_default))
    if category_underscores:
        cat_raw = F.regexp_replace(cat_raw, "_", " ")
    venue = venue_name if venue_name is not None else r["venue_name"]
    date = event_date if event_date is not None else r["event_date"]
    out = parsed.select(
        "source_spider",
        r["name"].alias("name"),
        r["url"].alias("url"),
        date.alias("event_date"),
        venue.alias("venue_name"),
        r["venue_address"].alias("venue_address"),
        r["description"].alias("description"),
        source.alias("source"),
        _title(cat_raw).alias("category"),
        r["genre"].alias("genre"),
        r["season"].alias("season"),
        safe_double(r["latitude"]).alias("latitude"),
        safe_double(r["longitude"]).alias("longitude"),
        r["price"].alias("price_raw"),
    )
    cond = _nonempty(F.col("name"))
    if require_venue:
        cond = cond & _nonempty(F.col("venue_name"))
    if require_url:
        cond = cond & _nonempty(F.col("url"))
    return out.filter(cond)


def canonicalize(raw: DataFrame) -> DataFrame:
    """Dispatch + project + union: transform_data.py:526-556 as one plan.

    Input: raw zone frame (source_spider string, raw_json string [, id]).
    Output: canonical projection (pre-standardization) with price_raw.
    """
    p = _parsed(raw)
    s = F.col("source_spider")
    r = F.col("r")

    arcgis = _common(
        p.filter(s == "nashville_arcgis"),
        F.lit("Nashville ArcGIS"),
        venue_name=r["name"],
        category_default="Civic Facility",
        category_underscores=True,
        event_date=F.lit(None).cast("string"),
        require_venue=True,
    )
    ticketmaster = _common(
        p.filter(s == "ticketmaster"),
        F.lit("Ticketmaster"),
        category_default="Event",
        require_venue=True,
    )
    yelp = _common(
        p.filter(s == "yelp"),
        F.lit("Yelp"),
        venue_name=r["name"],
        category_default="Business",
        event_date=F.lit(None).cast("string"),
    )
    google = _common(
        p.filter(s == "google_places"),
        F.lit("Google Places"),
        venue_name=r["name"],
        category_default="Attraction",
        event_date=F.lit(None).cast("string"),
    )
    # generic spider: display source via map with passthrough default
    # (transform_data.py:162-169)
    display = s
    for k, v in GENERIC_SOURCE_DISPLAY.items():
        display = F.when(s == k, F.lit(v)).otherwise(display)
    generic = _common(
        p.filter(
            s.isin("generic", *GENERIC_SOURCE_DISPLAY.keys())
        ),
        display,
        category_default="General",
    )
    seatgeek = _common(
        p.filter(s == "seatgeek"),
        F.lit("SeatGeek"),
        category_default="Event",
        require_venue=True,
    )
    # document path: structured rows only (text payloads route to the
    # extractor in sources.text_extract); file type from spider name
    # (transform_data.py:232-241)
    file_type = (
        F.when(s.contains("csv"), F.lit("CSV"))
        .when(s.contains("xlsx") | s.contains("xls"), F.lit("EXCEL"))
        .when(s.contains("docx"), F.lit("WORD"))
        .otherwise(F.lit("UNKNOWN"))
    )
    is_document = (s == "document") | (
        s.contains("csv") | s.contains("xlsx") | s.contains("xls") | s.contains("docx")
    )
    document = _common(
        p.filter(is_document & ~s.startswith("manual_upload_") & (s != "pdf")),
        F.concat(F.lit("Document Upload ("), file_type, F.lit(")")),
        venue_name=F.coalesce(r["venue_name"], r["name"]),
        category_default="Document Extracted",
        category_underscores=True,
    )
    pdf = _common(
        p.filter((s == "pdf") | s.startswith("manual_upload_")),
        F.lit("PDF Upload (Structured)"),
        category_default="Pdf Extracted",
        category_underscores=True,
        require_url=True,
    )

    branches = [arcgis, ticketmaster, yelp, google, generic, seatgeek, document, pdf]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def standardize(canonical: DataFrame, now_year: int | None = None) -> DataFrame:
    """The transformer stage (transformer.py:8-31): standardize dates,
    venue names, prices; categorize with the trusted-source gate. Expects
    canonicalize() output (with source_spider + price_raw)."""
    df = canonical.withColumn(
        "event_date",
        standardize_date(F.col("event_date"), F.col("source_spider"), now_year),
    ).withColumn("venue_name", standardize_venue_name(F.col("venue_name")))
    df = df.withColumn("price", standardize_price(F.col("price_raw")))
    cat, gen = categorize_with_trust_gate(
        F.col("source_spider"),
        F.col("category"),
        F.col("genre"),
        F.col("name"),
        F.col("description"),
        F.col("venue_name"),
    )
    return (
        df.withColumn("category", cat)
        .withColumn("genre", gen)
        .select(*EVENT_FIELDS)
    )


def run_pipeline(raw: DataFrame, now_year: int | None = None) -> DataFrame:
    """Full §3.1 transform: canonicalize → standardize → within-batch
    dedup on url (K2's ON CONFLICT analog; first writer wins like the
    reference's insert order — we keep min name for determinism)."""
    return standardize(canonicalize(raw), now_year).dropDuplicates(["url"])
