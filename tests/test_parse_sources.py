"""Per-source API-record parse projections (S2, S3/S4/S5 parse halves,
S7/S8 geometry+validate, A4 stats, F23 page links, K5 export) pinned to
the reference spider semantics with hand-built fixture records."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.operators.pagination import (
    pagination_links,
)
from nashville_etl_service_backup_spark.sources.parse import (
    arcgis_run_stats,
    parse_arcgis,
    parse_google_places,
    parse_seatgeek,
    parse_ticketmaster,
    parse_yelp,
)


def _jdf(spark, records):
    return spark.createDataFrame([(json.dumps(r),) for r in records], "json string")


TM_GOOD = {
    "name": " Rock Night ",
    "url": "https://tm.example/e/1",
    "id": "E1",
    "info": "",
    "pleaseNote": "Doors at 7",
    "dates": {"start": {"localDate": "2025-06-01", "localTime": "19:30:00"}},
    "_embedded": {
        "venues": [
            {
                "name": " The Hall ",
                "city": {"name": "Nashville"},
                "address": {"line1": " 1 Main St "},
            }
        ]
    },
}


def test_ticketmaster_parse(spark):
    bad_url = dict(TM_GOOD, url="ftp://nope")
    other_city = dict(TM_GOOD)
    other_city = json.loads(json.dumps(TM_GOOD))
    other_city["_embedded"]["venues"][0]["city"]["name"] = "Memphis"
    df = parse_ticketmaster(_jdf(spark, [TM_GOOD, bad_url, other_city]))
    rows = df.collect()
    assert len(rows) == 1  # bad URL and non-Nashville dropped
    r = rows[0]
    assert r["name"] == "Rock Night"
    assert r["event_date"] == "2025-06-01 19:30:00"
    assert r["venue_name"] == "The Hall"
    assert r["venue_address"] == "1 Main St"
    # info empty → falls through to pleaseNote (Python `or` semantics)
    assert r["description"] == "Doors at 7"


def test_seatgeek_parse_address_join(spark):
    rec = {
        "title": "",
        "short_title": "Game",
        "id": 42,
        "url": "https://sg.example/42",
        "datetime_utc": "",
        "datetime_local": "2025-02-03T19:00:00",
        "venue": {
            "name": "Arena",
            "city": "Nashville",
            "address": "100 Broadway",
            "extended_address": "",
        },
    }
    r = parse_seatgeek(_jdf(spark, [rec])).collect()[0]
    assert r["name"] == "Game"  # title empty → short_title
    assert r["event_date"] == "2025-02-03T19:00:00"  # utc empty → local
    assert r["venue_address"] == "100 Broadway"  # empty part skipped
    assert r["event_id"] == "42"


def test_yelp_description_build(spark):
    rec = {
        "name": "Hot Chicken Co",
        "url": "https://yelp.example/hcc",
        "rating": 4.5,
        "review_count": 120,
        "price": "$$",
        "categories": [{"title": "Southern"}, {"title": "Chicken"}],
        "display_phone": "(615) 555-0100",
        "location": {
            "display_address": ["123 Hot St", "Nashville, TN 37203"],
            "city": "Nashville",
        },
    }
    r = parse_yelp(_jdf(spark, [rec])).collect()[0]
    assert r["description"] == (
        "Rating: 4.5/5 | Reviews: 120 | Price: $$ | "
        "Categories: Southern, Chicken | Phone: (615) 555-0100"
    )
    assert r["venue_address"] == "123 Hot St, Nashville, TN 37203"
    # missing parts are skipped, not emitted empty
    sparse = {"name": "X", "url": "u", "location": {}}
    r2 = parse_yelp(_jdf(spark, [sparse])).collect()[0]
    assert r2["description"] == ""


def test_google_places_parse(spark):
    rec = {
        "displayName": {"text": "Centennial Park"},
        "formattedAddress": "2500 West End Ave",
        "location": {"latitude": 36.1489, "longitude": -86.8125},
        "id": "places/abc123",
        "rating": 4.8,
        "userRatingCount": 9000,
    }
    df = _jdf(spark, [rec]).withColumn("place_type", F.lit("park"))
    r = parse_google_places(df).collect()[0]
    assert r["url"] == (
        "https://www.google.com/maps/search/?api=1&query=36.1489,-86.8125"
        "&query_place_id=abc123"
    )
    assert r["description"] == "Rating: 4.8 (9000 reviews)"
    assert r["category"] == "park"
    # no coordinates → no URL; no rating → N/A
    sparse = {"displayName": {"text": "Mystery"}, "location": {}}
    r2 = parse_google_places(
        _jdf(spark, [sparse]).withColumn("place_type", F.lit("park"))
    ).collect()[0]
    assert r2["url"] is None
    assert r2["description"] == "Rating: N/A (0 reviews)"


ARC_POINT = {
    "attributes": {
        "FacilityName": "Shelby Park",
        "Address": "S 20th St",
        "FacilityType": "Park",
    },
    # near the Nashville state-plane origin → in range after transform
    "geometry": {"x": 1738000.0, "y": 665000.0},
}
ARC_RING = {
    "attributes": {"FacilityName": "Ring Park", "Address": "Ring Rd"},
    "geometry": {
        "rings": [[[1738000.0, 665000.0], [1738100.0, 665000.0], [1738050.0, 665150.0]]]
    },
}
ARC_BAD_NAME = {
    "attributes": {"FacilityName": "n/a", "Address": "Nowhere"},
    "geometry": {"x": 1738000.0, "y": 665000.0},
}
ARC_FAR = {
    "attributes": {"FacilityName": "Far Away", "Address": "Elsewhere"},
    # ~5e6 ft north → way out of the lat gate
    "geometry": {"x": 1738000.0, "y": 5000000.0},
}


def _parse_arc(spark, recs):
    return parse_arcgis(
        _jdf(spark, recs),
        dataset_label="Parks",
        category="park",
        name_field="FacilityName",
        address_field="Address",
        extra_fields=["FacilityType", "Description"],
    )


def test_arcgis_parse_point_and_ring(spark):
    rows = {r["name"]: r for r in _parse_arc(spark, [ARC_POINT, ARC_RING]).collect()}
    p = rows["Shelby Park"]
    assert p["reject_reason"] is None
    assert abs(p["latitude"] - 36.1627) < 1e-6
    assert abs(p["longitude"] + 86.7816) < 1e-6
    assert p["description"] == "Parks | FacilityType: Park"
    assert p["url"].startswith("https://www.google.com/maps/search/?api=1&query=36.16")
    ring = rows["Ring Park"]
    assert ring["reject_reason"] is None
    # centroid x = 1738050, y = 665050 → slightly N/E of the origin point
    assert ring["latitude"] > p["latitude"]
    assert ring["longitude"] > p["longitude"]


def test_arcgis_rejects_and_stats(spark):
    parsed = _parse_arc(spark, [ARC_POINT, ARC_RING, ARC_BAD_NAME, ARC_FAR])
    reasons = {
        r["name"]: r["reject_reason"]
        for r in parsed.collect()
    }
    assert reasons[None] == "no_name"  # junk name nulled then rejected
    assert reasons["Far Away"] == "out_of_range"
    stats = arcgis_run_stats(parsed).collect()[0]
    assert stats["total"] == 4
    assert stats["yielded"] == 2
    assert stats["no_name"] == 1
    assert stats["out_of_range"] == 1
    # reference parity: out-of-range features count under no_coords TOO
    # (nashville_arcgis.py increments both stats_counter keys)
    assert stats["no_coords"] == 1
    assert stats["yield_rate_pct"] == 50.0


def test_pagination_links_parity(spark):
    # reference app.py:35-50 hand-computed expectations
    cases = [
        # (current, total) -> (show_first, show_last, l_ell, r_ell, pages)
        ((1, 10), (False, True, False, True, [1, 2, 3, 4, 5])),
        ((6, 10), (True, True, True, True, [4, 5, 6, 7, 8])),
        ((10, 10), (True, False, True, False, [6, 7, 8, 9, 10])),
        ((2, 3), (False, False, False, False, [1, 2, 3])),
    ]
    df = spark.createDataFrame(
        [(c, t) for (c, t), _ in cases], "cur int, tot int"
    )
    got = df.select(
        "cur", pagination_links(F.col("cur"), F.col("tot")).alias("p")
    ).collect()
    by_cur = {r["cur"]: r["p"] for r in got}
    for (c, t), (sf, sl, le, re_, pages) in cases:
        p = by_cur[c]
        assert p["show_first"] == sf, (c, t)
        assert p["show_last"] == sl
        assert p["show_left_ellipsis"] == le
        assert p["show_right_ellipsis"] == re_
        assert list(p["pages"]) == pages
