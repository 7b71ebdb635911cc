"""Stage decomposition of llm_corpus_curation (round 10, VERDICT Next
#3) — the query has never had one. Replays the query's exact stages at
sf0.1, timing each materialization with the noop sink; caches are left
in place between stages exactly as the query leaves them, so the
deltas are per-stage marginal costs.

Usage: python tools/profile_curation.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.operators import (
    release_persisted,
    spread,
    track_persist,
)
from nashville_etl_service_backup_spark.operators.dedup import (
    lsh_near_dup_pairs,
    resolve_duplicates,
)
from nashville_etl_service_backup_spark.queries.llmdata import (
    _funnel_split,
    load,
    split_assign,
    ws_token_count,
)
from nashville_etl_service_backup_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="curation-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {}
    for run in ("run1", "run2"):
        t = {}
        docs = spread(load(spark, sf_dir, "documents"))
        t0 = time.perf_counter()
        _, survivors = _funnel_split(docs, keep_cols=("doc_id", "lang"))
        kept = track_persist(
            survivors.filter(F.col("late_verdict") == "kept").select(
                "doc_id", "lang", "text"
            )
        )
        noop(kept)
        t1 = time.perf_counter()
        t["funnel_kept_persist"] = round(t1 - t0, 3)
        pairs = lsh_near_dup_pairs(
            kept, "doc_id", "text", shingle_n=2, num_hashes=4,
            bands=2, threshold=0.6,
        )
        noop(pairs)
        t2 = time.perf_counter()
        t["lsh_pairs"] = round(t2 - t1, 3)
        final = resolve_duplicates(kept, "doc_id", pairs)
        noop(final)
        t3 = time.perf_counter()
        t["resolve_cc_antijoin"] = round(t3 - t2, 3)
        agg = (
            final.select(
                split_assign(F.col("doc_id")).alias("split"),
                "lang",
                ws_token_count(F.col("text")).alias("_nt"),
            )
            .groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_nt").alias("n_tokens"),
            )
        )
        noop(agg)
        t4 = time.perf_counter()
        t["split_token_agg"] = round(t4 - t3, 3)
        t["total"] = round(t4 - t0, 3)
        out[run] = t
        release_persisted()
        spark.catalog.clearCache()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
