"""Subset benchmark — same protocol as bench.py (sf0.001 warmup ×3,
one untimed measured-SF pass, min-of-3 timed) but over an explicit
query list, for iterating on a perf fix without the full 131-query run.

Usage: python tools/bench_subset.py sim_ann_ivf dedup_semantic_pairs ...
Prints one JSON line {name: sec} and nothing else on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nashville_etl_service_backup_spark import queries as _q
from nashville_etl_service_backup_spark.operators import release_persisted
from nashville_etl_service_backup_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("{}")
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _q.extended_queries()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    for _ in range(3):
        for name in names:
            materialize(qs[name](spark, warm_dir))
        release_persisted()
        spark.catalog.clearCache()
    for name in names:
        materialize(qs[name](spark, sf_dir))
    release_persisted()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            release_persisted()
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    print(json.dumps(timings, separators=(",", ":")))


if __name__ == "__main__":
    main()
