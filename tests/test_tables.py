"""tables.load schema tolerance: the driver has shipped events.ts as
TIMESTAMP(NANOS) (round 1) and TIMESTAMP(MICROS) NTZ (round 2) — the
loader must normalize BOTH to identical session-TZ microsecond
timestamps."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from nashville_etl_service_backup_spark.tables import load

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 10, 30, 0, 123456), 7, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 6, 2, 23, 59, 59, 999999), 8, "view", 2.0, "{}"),
]


def _write(tmp_path, ts_type):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    d = tmp_path / ts_type.unit
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_events_loader_normalizes_nanos_and_micros(spark, tmp_path):
    got = {}
    for ts_type in (pa.timestamp("ns"), pa.timestamp("us")):
        sf_dir = _write(tmp_path, ts_type)
        ev = load(spark, sf_dir, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        got[ts_type.unit] = sorted(
            (r["event_id"], str(r["ts"])) for r in ev.collect()
        )
    assert got["ns"] == got["us"]
    assert got["us"][0][1] == "2024-01-01 10:30:00.123456"
