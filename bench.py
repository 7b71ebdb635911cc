"""Benchmark harness — the driver runs this per-round.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization uses the noop sink (df.write.format("noop")) so every
column is computed JVM-side without driver collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nashville_etl_service_backup_spark import queries as _q
from nashville_etl_service_backup_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q_running_total",
    "q_customer_order_stats",
    "q_doc_search_rank",
    "q_tumbling_window",
    "q_events_pivot",
    "dedup_lsh_pairs",
    "sim_topk_bruteforce",
    "text_token_counts",
    "doc_fingerprints",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _q.all_queries()

    # JVM/session warmup: tiny action so first measured query doesn't pay
    # class-loading + codegen bootstrap
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
