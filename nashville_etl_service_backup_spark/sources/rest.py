"""REST connector scaffolding — S1–S10 (SURVEY §2.1).

The reference's spiders push predicates/projections/sorts/limits into
the remote API at request-construction time (SURVEY §4.1). Here each
source is a RequestPlan builder encoding the same pushdown, plus a
paginator; the HTTP call itself is an injected `fetch` callable
(tests/offline use fakes — this container has no network). Fetched
records land via spark.createDataFrame against an explicit schema, so
everything downstream is a plain DataFrame with Catalyst pushdown.

Caps mirror the reference exactly (BASELINE.md):
ticketmaster 5×200, seatgeek 10×50, yelp offset<1000, google 20/type,
arcgis 1000/request.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from nashville_etl_service_backup_spark.schemas import RAW_ITEM_SCHEMA


@dataclass(frozen=True)
class RequestPlan:
    """One HTTP request with its pushdown encoded."""

    url: str
    params: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)
    method: str = "GET"
    body: dict | None = None


Fetch = Callable[[RequestPlan], dict]
ParseFn = Callable[[dict], list[dict]]


def ticketmaster_requests(api_key: str, start_iso: str) -> Iterator[RequestPlan]:
    """S1 (ticketmaster_spider.py:10-49): dmaId=343, size=200, date filter
    + sort pushed to the API, page cap 5."""
    for page in range(5):
        yield RequestPlan(
            url="https://app.ticketmaster.com/discovery/v2/events.json",
            params={
                "apikey": api_key,
                "dmaId": "343",
                "size": "200",
                "page": str(page),
                "startDateTime": start_iso,
                "sort": "date,asc",
            },
        )


def seatgeek_requests(client_id: str) -> Iterator[RequestPlan]:
    """S3 (seatgeek_spider.py:17-66): city/state filter pushdown,
    per_page=50, cap 10 pages."""
    for page in range(1, 11):
        yield RequestPlan(
            url="https://api.seatgeek.com/2/events",
            params={
                "client_id": client_id,
                "venue.city": "Nashville",
                "venue.state": "TN",
                "per_page": "50",
                "page": str(page),
            },
        )


def yelp_requests(api_key: str, categories: str) -> Iterator[RequestPlan]:
    """S4 (yelp_spider.py:31-62): category/radius filter + rating sort
    pushdown, offset pagination capped at 1000."""
    for offset in range(0, 1000, 50):
        yield RequestPlan(
            url="https://api.yelp.com/v3/businesses/search",
            params={
                "location": "Nashville, TN",
                "categories": categories,
                "radius": "40000",
                "limit": "50",
                "offset": str(offset),
                "sort_by": "rating",
            },
            headers={"Authorization": f"Bearer {api_key}"},
        )


GOOGLE_PLACE_TYPES = [
    "tourist_attraction", "museum", "park", "night_club", "restaurant", "bar",
]  # google_places_spider.py:14-21


def google_places_requests(api_key: str) -> Iterator[RequestPlan]:
    """S5 (google_places_spider.py:22-57): one POST per type with
    FieldMask PROJECTION pushdown and a 15 km circle filter."""
    for place_type in GOOGLE_PLACE_TYPES:
        yield RequestPlan(
            url="https://places.googleapis.com/v1/places:searchNearby",
            method="POST",
            headers={
                "X-Goog-Api-Key": api_key,
                # projection pushdown: only the fields we canonicalize
                "X-Goog-FieldMask": (
                    "places.displayName,places.formattedAddress,"
                    "places.location,places.primaryType,places.id"
                ),
            },
            body={
                "includedTypes": [place_type],
                "maxResultCount": 20,
                "locationRestriction": {
                    "circle": {
                        "center": {"latitude": 36.1627, "longitude": -86.7816},
                        "radius": 15000.0,
                    }
                },
            },
        )


# S6 (nashville_arcgis.py:23-38): per-dataset server-side WHERE +
# outFields projection pushdown
ARCGIS_DATASETS: list[dict] = [
    {
        "name": "parks",
        "where": "1=1",
        "out_fields": "*",
        "enabled": True,
    },
    {
        "name": "libraries",
        "where": "1=1",
        "out_fields": "*",
        "enabled": True,
    },
    {
        "name": "fire_stations",
        "where": "FacilityType IS NOT NULL AND Address IS NOT NULL",
        "out_fields": "FacilityType,Address,City",
        "enabled": True,
    },
    {
        "name": "police_stations",
        "where": "Address IS NOT NULL",
        "out_fields": "*",
        "enabled": True,
    },
    {
        "name": "health_clinics",
        "where": "1=1",
        "out_fields": "*",
        "enabled": True,
    },
    {
        "name": "public_artwork",
        "where": "1=1",
        "out_fields": "*",
        "enabled": True,
    },
    {
        "name": "cemeteries",
        "where": "1=1",
        "out_fields": "*",
        "enabled": True,
    },
]

ARCGIS_RECORDS_PER_REQUEST = 1000  # nashville_arcgis.py:18


def arcgis_requests(
    base_url: str, dataset: dict, offset: int = 0
) -> RequestPlan:
    """S6 (nashville_arcgis.py:59-76): WHERE + outFields + offset paging
    pushed server-side."""
    return RequestPlan(
        url=f"{base_url}/{dataset['name']}/FeatureServer/0/query",
        params={
            "where": dataset["where"],
            "outFields": dataset["out_fields"],
            "resultOffset": str(offset),
            "resultRecordCount": str(ARCGIS_RECORDS_PER_REQUEST),
            "f": "json",
        },
    )


def fetch_paged(
    requests: Iterator[RequestPlan],
    fetch: Fetch,
    parse: ParseFn,
    stop_when_empty: bool = True,
) -> list[dict]:
    """Driver-side paged fetch loop (the reference's per-spider
    pagination). Remote APIs are inherently sequential-paged; volume is
    bounded by the reference's own caps (≤ a few thousand rows), so
    driver-side accumulation is correct here — the DataFrame takes over
    immediately after."""
    out: list[dict] = []
    for plan in requests:
        payload = fetch(plan)
        records = parse(payload)
        if not records and stop_when_empty:
            break
        out.extend(records)
    return out


def to_dataframe(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Fetched records → typed DataFrame (all-string BusinessItem shape;
    casts happen in the canonicalization plan)."""
    rows = [
        tuple(
            None if rec.get(f.name) is None else str(rec.get(f.name))
            for f in RAW_ITEM_SCHEMA.fields
        )
        for rec in records
    ]
    return spark.createDataFrame(rows, RAW_ITEM_SCHEMA)
