"""Synthesize a 10x-scaled copy of sf0.1 for the round-10 SCALING
PROBE (VERDICT Next #5): no generator for the driver's synthetic
corpus exists in this repo (the sf dirs are driver-generated and
read-only), so the probe data is built by key-offset replication —
each table is unioned with k shifted copies whose id/key columns are
offset into disjoint ranges, so every join/group keeps linear fan-out
and the replicated corpus has k disjoint copies of each graph/corpus
structure.

This data is ONLY for measuring how the 8-vs-32-core parallelism
ratio of the slow queries moves with input size (the floor
adjudications' "per-barrier aggregate work dominates at scale" claim).
It is NOT oracle-checked and never feeds the graded bench.

Usage: python tools/gen_scaled_probe_data.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.session import get_spark
from nashville_etl_service_backup_spark.tables import load

SRC = "/root/testdata/sf0.1"

# key columns offset per copy (disjoint id spaces); non-key columns
# (text, dates, amounts, vectors) replicate unchanged
OFFSET_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1probe"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="gen-scaled-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name, keys in OFFSET_COLS.items():
        df = load(spark, SRC, name)
        if not keys:
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            print(name, "copied")
            continue
        spans = {
            k: df.agg(F.max(F.col(k).cast("long"))).first()[0] + 1
            for k in keys
        }
        copies = []
        for i in range(factor):
            c = df
            for k in keys:
                c = c.withColumn(
                    k, (F.col(k).cast("long") + F.lit(i * spans[k])).cast(
                        df.schema[k].dataType
                    )
                )
            copies.append(c)
        outdf = copies[0]
        for c in copies[1:]:
            outdf = outdf.unionByName(c)
        outdf.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(name, f"x{factor}", {k: int(v) for k, v in spans.items()})


if __name__ == "__main__":
    main()
