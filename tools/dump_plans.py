"""Dump `explain("formatted")` for named registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt per query. Used to produce the
plans/r09/<query>_before.txt / _after.txt evidence files (before = run
from a worktree pinned at the prior round's snapshot commit).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nashville_etl_service_backup_spark import queries as _q
from nashville_etl_service_backup_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _q.extended_queries()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jmode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path)


if __name__ == "__main__":
    main()
