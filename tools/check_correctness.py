"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares:
- row count
- schema (column names; arrow types printed for inspection)
- order-insensitive value hash (columns sorted by name, rows sorted by
  their stringified tuple, md5 over the whole thing)

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nashville_etl_service_backup_spark.session import get_spark
from nashville_etl_service_backup_spark.tables import TABLES


def canon(df) -> tuple[int, list[str], str]:
    """(row_count, sorted_columns, value_hash) from a pandas frame."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False, name=None):
        parts = []
        for v in t:
            if v is None or (isinstance(v, float) and v != v):
                parts.append("∅")
            elif isinstance(v, float):
                parts.append(repr(round(v, 9)))
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only and (set(only) - set(qs)):
        # extended-registry fallback: requested names not in the
        # driver's 50 (suite members, bench-only entries) are still
        # checkable
        from nashville_etl_service_backup_spark import queries as _q

        ext, exto = _q.extended_queries(), _q.extended_oracles()
        for n in set(only) - set(qs):
            if n in ext:
                qs[n] = ext[n]
                if n in exto:
                    oracles[n] = exto[n]
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({spark_t:.1f}s)")
            if len(sdf) == 0:
                print(f"  WARNING: rows-only query returned 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, scols, sh = canon(sdf)
        oc, ocols, oh = canon(odf)
        ok = (sc == oc) and (scols == ocols) and (sh == oh)
        if ok:
            print(f"PASS {name}: {sc} rows ({spark_t:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {sc} vs {oc}; cols {scols} vs {ocols}")
            if scols == ocols and sc == oc:
                # value mismatch — show first differing rows
                import pandas as pd

                s_sorted = sdf[sorted(sdf.columns)].astype(str).apply(
                    lambda r: "|".join(r), axis=1
                ).sort_values().reset_index(drop=True)
                o_sorted = odf[sorted(odf.columns)].astype(str).apply(
                    lambda r: "|".join(r), axis=1
                ).sort_values().reset_index(drop=True)
                diff = s_sorted != o_sorted
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"  spark: {s_sorted[i]}")
                    print(f"  duck : {o_sorted[i]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
