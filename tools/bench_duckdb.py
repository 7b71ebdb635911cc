"""DuckDB side of the BENCH yardstick.

BASELINE.md defines the perf target as "within 2x of DuckDB executing
the identical oracle_sql() queries on the same sf0.1 parquet". This
times exactly that: each headline query's oracle SQL on DuckDB
(threads = SPARK_GRAFT_CPUS) against the same parquet files bench.py
reads, warm run after one untimed pass, printed as one JSON line with
the same query keys so the two outputs diff cleanly.

Usage: python tools/bench_duckdb.py  [honors SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import bench
from nashville_etl_service_backup_spark.queries import extended_oracles
from nashville_etl_service_backup_spark.tables import TABLES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threads = os.environ.get("SPARK_GRAFT_CPUS", "32")
    con = duckdb.connect()
    con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # extended: HEADLINE names individual queries, including ones the
    # 50-entry registry only exposes inside a composite suite
    oracles = extended_oracles()
    timings: dict[str, float] = {}
    for name in bench.HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            timings[name] = None
            continue
        con.execute(sql).fetchall()  # warm (IO cache, plan)
        best = float("inf")
        for _ in range(3):  # min-of-3, same protocol as bench.py
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(v for v in timings.values() if v is not None), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
