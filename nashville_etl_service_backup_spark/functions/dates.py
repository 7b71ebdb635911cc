"""Date standardization — F1–F4, F16 (SURVEY §2.8).

Reference standardizer.py:4-49 ports, as native Column expressions:
- F1 ISO branch (ticketmaster/seatgeek): ' '→'T', parse, re-emit ISO.
- F2 nashville.com branch: "October 2 @ 8:00 pm" + CURRENT-YEAR injection
  (documented nondeterminism — parameterized here as ``now_year``),
  localized America/Chicago.
- F3 underdog branch: "June 14, 2025 | 7:30PM CDT" with tz-token map.
- F4 yelp → NULL; unknown source → passthrough raw.

Timezone localization emits ISO strings WITH the local UTC offset, matching
pytz ``localize().isoformat()``. Offsets are computed natively via
``to_utc_timestamp`` deltas — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TZ_BY_TOKEN = {
    "CDT": "America/Chicago",
    "CST": "America/Chicago",
    "EDT": "America/New_York",
    "EST": "America/New_York",
}


def _iso_with_offset(local_ts: Column, tz: Column) -> Column:
    """Format a tz-naive local timestamp as ISO-8601 with the zone's UTC
    offset at that instant, e.g. 2025-06-14T19:30:00-05:00."""
    utc = F.to_utc_timestamp(local_ts, tz)
    offset_sec = F.unix_timestamp(local_ts) - F.unix_timestamp(utc)
    sign = F.when(offset_sec < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_sec = F.abs(offset_sec)
    hh = F.lpad((abs_sec / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((abs_sec % 3600) / 60).cast("int").cast("string"), 2, "0")
    return F.concat(
        F.date_format(local_ts, "yyyy-MM-dd'T'HH:mm:ss"), sign, hh, F.lit(":"), mm
    )


def _iso_branch(raw: Column) -> Column:
    """F1 (standardizer.py:8-14): tolerate ' ' or 'T' separators; emit
    canonical ISO; unparseable → fall through to raw passthrough."""
    norm = F.regexp_replace(F.trim(raw), " ", "T")
    ts = F.coalesce(
        F.try_to_timestamp(norm, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(norm, F.lit("yyyy-MM-dd'T'HH:mm")),
        F.try_to_timestamp(norm, F.lit("yyyy-MM-dd")),
    )
    return F.when(ts.isNotNull(), F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")).otherwise(
        raw
    )


def _nashville_branch(raw: Column, now_year: Column) -> Column:
    """F2 (standardizer.py:15-26): regex "(Month D) @ (H:MM am/pm)", inject
    now_year, parse "%B %d %Y %I:%M %p", localize America/Chicago."""
    date_part = F.regexp_extract(raw, r"(?i)(\w+\s\d+)\s*@\s*([\d:]+\s*[ap]m)", 1)
    time_part = F.regexp_extract(raw, r"(?i)(\w+\s\d+)\s*@\s*([\d:]+\s*[ap]m)", 2)
    # normalize '8:00 pm' / '8:00pm' → '8:00 PM' for the parser
    time_norm = F.upper(F.regexp_replace(time_part, r"\s+", " "))
    time_norm = F.regexp_replace(time_norm, r"(?i)([\d:]+)\s*([AP]M)", r"$1 $2")
    full = F.concat_ws(" ", date_part, now_year.cast("string"), time_norm)
    ts = F.coalesce(
        F.try_to_timestamp(full, F.lit("MMMM d yyyy h:mm a")),
        F.try_to_timestamp(full, F.lit("MMMM d yyyy h a")),
    )
    return F.when(
        (date_part != "") & ts.isNotNull(),
        _iso_with_offset(ts, F.lit("America/Chicago")),
    ).otherwise(raw)


def _underdog_branch(raw: Column) -> Column:
    """F3 (standardizer.py:27-46): 'Month D, YYYY | H:MMPM TZ'; tz token
    CDT/CST→Chicago, EDT/EST→New_York, default Chicago; unparseable → NULL
    (the reference's except path returns None)."""
    # F.get, not getItem: null-safe when the '|' is absent (ANSI mode
    # throws on out-of-bounds getItem); reference's except path → NULL.
    date_part = F.trim(F.get(F.split(raw, r"\|"), 0))
    time_part = F.trim(F.get(F.split(raw, r"\|"), 1))
    tz_token = F.regexp_extract(time_part, r"(CDT|CST|EDT|EST)", 1)
    tz = F.when(tz_token.isin("EDT", "EST"), F.lit("America/New_York")).otherwise(
        F.lit("America/Chicago")
    )
    time_clean = F.upper(F.trim(F.regexp_replace(time_part, r"(CDT|CST|EDT|EST)", "")))
    full = F.concat_ws(" ", date_part, time_clean)
    ts = F.coalesce(
        F.try_to_timestamp(full, F.lit("MMMM d, yyyy h:mma")),
        F.try_to_timestamp(full, F.lit("MMMM d, yyyy ha")),
    )
    return F.when(ts.isNotNull(), _iso_with_offset(ts, tz)).otherwise(
        F.lit(None).cast("string")
    )


def standardize_date(
    raw: Column, source: Column, now_year: int | Column | None = None
) -> Column:
    """Dispatch on source exactly as standardizer.py:4-49.

    ``now_year``: the reference injects datetime.now().year (F2); pass a
    fixed year for deterministic tests, None → current year at plan time.
    """
    if now_year is None:
        now_year = F.year(F.current_date())
    elif isinstance(now_year, int):
        now_year = F.lit(now_year)
    src = F.coalesce(source, F.lit(""))
    out = (
        F.when(raw.isNull() | (raw.cast("string") == ""), F.lit(None).cast("string"))
        .when(src.isin("ticketmaster", "seatgeek"), _iso_branch(raw))
        .when(src.contains("nashville.com"), _nashville_branch(raw, now_year))
        .when(src == "underdog", _underdog_branch(raw))
        .when(src == "yelp", F.lit(None).cast("string"))
        .otherwise(raw.cast("string"))
    )
    return out


def display_date(iso: Column) -> Column:
    """F16 (app.py:23-32): ISO → 'Jun 14, 2025 at 07:30 PM', tolerant of
    'Z'/offsets; unparseable → passthrough."""
    norm = F.regexp_replace(iso, "Z$", "+00:00")
    ts = F.coalesce(
        F.try_to_timestamp(norm, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(norm, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(norm, F.lit("yyyy-MM-dd")),
    )
    return F.when(
        ts.isNotNull(), F.date_format(ts, "MMM dd, yyyy 'at' hh:mm a")
    ).otherwise(iso)


def season_label(ts: Column) -> Column:
    """'Fall 2025'-style label (transform_data.py:39 semantics: month →
    meteorological season + year)."""
    m = F.month(ts)
    season = (
        F.when(m.isin(12, 1, 2), F.lit("Winter"))
        .when(m.isin(3, 4, 5), F.lit("Spring"))
        .when(m.isin(6, 7, 8), F.lit("Summer"))
        .otherwise(F.lit("Fall"))
    )
    return F.concat_ws(" ", season, F.year(ts).cast("string"))


def parse_dates_pandas_udf(formats: tuple[str, ...] = (
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%d %H:%M:%S",
    "%B %d %Y %I:%M %p",
    "%m/%d/%Y",
)):
    """D3 (standardizer.py:4-49): the pandas-UDF fallback for exotic
    date formats the native expressions don't cover — Arrow-batched,
    first-matching-format wins, NULL on total failure (the reference's
    try/except passthrough). Prefer the native `standardize_date`
    branches; reach for this only when a new source ships formats
    Spark's `to_timestamp` patterns can't express."""
    import pandas as pd
    from datetime import datetime
    from pyspark.sql.functions import pandas_udf

    def _parse(raw):
        def one(v):
            if v is None or (isinstance(v, float) and v != v):
                return None
            s = str(v).strip()
            for fmt in formats:
                try:
                    return datetime.strptime(s, fmt).isoformat()
                except ValueError:
                    continue
            return None

        return raw.map(one)

    # real type objects (not strings): this module uses
    # `from __future__ import annotations`, which would stringify inline
    # hints and break pandas_udf's type-hint inference
    _parse.__annotations__ = {"raw": pd.Series, "return": pd.Series}
    return pandas_udf(_parse, "string")
