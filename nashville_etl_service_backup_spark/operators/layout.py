"""Data-layout operators: Morton (Z-order) clustering keys and a
pruning-effectiveness audit.

At 100 TB the single biggest scan lever after partition pruning is FILE
layout: parquet row-group zone maps (per-file min/max) only prune a
predicate column if rows are clustered by it. Linear sort clusters ONE
column perfectly and leaves every other column's per-file span at the
full domain; interleaving the bits of two (or more) key columns into a
Morton / Z-order key (Morton 1966; the technique behind Delta/Iceberg
``ZORDER BY``) spreads the clustering budget across all of them — each
file then covers a small rectangle of the key space and min/max pruning
works for predicates on EITHER column.

Everything here is exact integer arithmetic (bit shifts, masks, integer
sums), so the DuckDB oracle replays it bit-for-bit; the audit's only
float is a final rounded average.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    2·bits-bit Z-order key (x in the even positions, y in the odd).
    A pure codegen projection — Σ ((x>>i)&1)·4^i + ((y>>i)&1)·2·4^i —
    no shuffle, no UDF; integer sums, so order is irrelevant."""
    expr: Column | None = None
    for i in range(bits):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long") * (
            1 << (2 * i)
        )
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long") * (
            1 << (2 * i + 1)
        )
        term = xb + yb
        expr = term if expr is None else expr + term
    assert expr is not None
    return expr


def morton_key_sql(x: str, y: str, bits: int) -> str:
    """DuckDB twin of :func:`morton_key` — the same shift/mask sum."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def layout_pruning_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int,
    file_bits: int,
    x_band: tuple[int, int],
    y_band: tuple[int, int],
) -> DataFrame:
    """Compare a Z-order file layout against an x-linear layout on the
    same rows: assign every row to one of 2^``file_bits`` "files" (the
    top ``file_bits`` bits of its layout key — contiguous key ranges,
    exactly how a sorted write splits into files), then per layout
    report the zone-map quality and what a band predicate would scan:

      layout         'zorder' | 'linear_x'
      n_files        files actually populated
      avg_x_span     avg per-file (max(x) − min(x) + 1) — zone-map
                     tightness on x (rounded 6)
      avg_y_span     same for y
      files_x_band   files whose [min_x, max_x] intersects ``x_band``
                     (what min/max pruning would leave to scan)
      files_y_band   same for ``y_band``

    The expected shape: linear_x has avg_x_span ≈ domain/n_files and
    files_x_band ≈ band share, but avg_y_span ≈ FULL domain and
    files_y_band = n_files (no pruning on y at all); zorder pays a
    modest factor on x to make BOTH bands prune.

    Scale shape: one narrow projection (the keys) + one map-side-
    combinable groupBy per layout + a 2-row final aggregate. Nothing
    touches the driver."""
    zfile = F.shiftright(
        morton_key(F.col(x_col), F.col(y_col), bits), 2 * bits - file_bits
    )
    lfile = F.shiftright(F.col(x_col), bits - file_bits)
    keyed = df.select(
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        zfile.alias("zfile"),
        lfile.alias("lfile"),
    )

    def _stats(file_col: str, layout: str) -> DataFrame:
        per_file = keyed.groupBy(file_col).agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        x_lo, x_hi = x_band
        y_lo, y_hi = y_band
        return per_file.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.round(
                F.sum(F.col("max_x") - F.col("min_x") + 1).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_x_span"),
            F.round(
                F.sum(F.col("max_y") - F.col("min_y") + 1).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_y_span"),
            F.sum(
                F.when(
                    (F.col("min_x") <= x_hi) & (F.col("max_x") >= x_lo), 1
                ).otherwise(0)
            ).alias("files_x_band"),
            F.sum(
                F.when(
                    (F.col("min_y") <= y_hi) & (F.col("max_y") >= y_lo), 1
                ).otherwise(0)
            ).alias("files_y_band"),
        )

    return _stats("zfile", "zorder").unionByName(_stats("lfile", "linear_x"))


def layout_pruning_audit_sql(
    source_sql: str,
    bits: int,
    file_bits: int,
    x_band: tuple[int, int],
    y_band: tuple[int, int],
) -> str:
    """DuckDB twin of :func:`layout_pruning_audit`. ``source_sql`` must
    yield columns (x, y)."""
    mk = morton_key_sql("x", "y", bits)
    x_lo, x_hi = x_band
    y_lo, y_hi = y_band

    def stats(file_expr: str, layout: str) -> str:
        return f"""
SELECT '{layout}' AS layout, COUNT(*) AS n_files,
  ROUND(CAST(SUM(max_x - min_x + 1) AS DOUBLE) / COUNT(*), 6)
    AS avg_x_span,
  ROUND(CAST(SUM(max_y - min_y + 1) AS DOUBLE) / COUNT(*), 6)
    AS avg_y_span,
  CAST(SUM(CASE WHEN min_x <= {x_hi} AND max_x >= {x_lo} THEN 1 ELSE 0 END)
       AS BIGINT) AS files_x_band,
  CAST(SUM(CASE WHEN min_y <= {y_hi} AND max_y >= {y_lo} THEN 1 ELSE 0 END)
       AS BIGINT) AS files_y_band
FROM (
  SELECT {file_expr} AS f,
    MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y
  FROM src GROUP BY 1)"""

    return (
        f"WITH src AS ({source_sql})\n"
        + stats(f"({mk} >> {2 * bits - file_bits})", "zorder")
        + "\nUNION ALL\n"
        + stats(f"(x >> {bits - file_bits})", "linear_x")
    )


def encoding_audit(
    df: DataFrame,
    key_col: str,
    cols: list[str],
    unit_div: int = 4096,
) -> DataFrame:
    """Columnar-encoding planning audit: for each column, how well the
    CURRENT layout order (ascending ``key_col``) would dictionary- and
    run-length-encode — the storage-side twin of the Z-order pruning
    audit (choosing a sort order is choosing your RLE runs; see e.g.
    Abadi, Madden & Ferreira 2006, "Integrating compression and
    execution in column-oriented database systems").

    Encoding units are ``unit_div``-wide key ranges (runs do NOT span
    units, matching parquet row-group boundaries — and making every
    window PARTITIONED by unit rather than one global sort). Per
    column:

      n_rows       total values
      n_distinct   exact global distinct count
      dict_bits    bits/value a dictionary needs: ceil(log2(n_distinct))
                   as exact integer bit-length (length of bin(nd−1) —
                   no float log2, whose ULP at exact powers of two
                   would flip the answer)
      n_runs       value-change count in layout order within units
      runs_ratio   n_runs / n_rows, rounded 6 (1.0 = RLE useless,
                   → 0 = RLE collapses the column)

    Values are compared as strings (callers pass string/int/date
    columns; float-to-string formatting is engine-specific). Scale
    shape: one narrow stack projection, windows partitioned by
    (unit, column), one map-side-combinable aggregate."""
    n = len(cols)
    stack_expr = "stack({}, {}) as (col, val)".format(
        n, ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    )
    unit = (F.col(key_col) / unit_div).cast("long").alias("_unit")
    stacked = df.select(F.col(key_col).alias("_k"), unit, F.expr(stack_expr))
    from pyspark.sql.window import Window

    w = Window.partitionBy("_unit", "col").orderBy("_k")
    runs = stacked.select(
        "col",
        "val",
        (
            (F.row_number().over(w) == 1)
            | ~F.lag("val").over(w).eqNullSafe(F.col("val"))
        )
        .cast("int")
        .alias("_rs"),
    )
    agg = runs.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("val").alias("n_distinct"),
        F.sum("_rs").alias("n_runs"),
    )
    nd = F.col("n_distinct")
    dict_bits = (
        F.when(nd <= 1, F.lit(0))
        .otherwise(F.length(F.bin(nd - 1)))
        .cast("int")
    )
    return agg.select(
        "col",
        "n_rows",
        "n_distinct",
        dict_bits.alias("dict_bits"),
        "n_runs",
        F.round(
            F.col("n_runs").cast("double") / F.col("n_rows"), 6
        ).alias("runs_ratio"),
    )


def encoding_audit_sql(
    source_sql: str,
    key_col: str,
    cols: list[str],
    unit_div: int = 4096,
) -> str:
    """DuckDB twin of :func:`encoding_audit`."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {key_col} AS k, {key_col} // {unit_div} AS unit,"
        f" '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM src"
        for c in cols
    )
    return f"""
WITH src AS ({source_sql}),
stacked AS ({unions}),
runs AS (
  SELECT col, val,
    CASE WHEN ROW_NUMBER() OVER w = 1
          OR LAG(val) OVER w IS DISTINCT FROM val
         THEN 1 ELSE 0 END AS rs
  FROM stacked
  WINDOW w AS (PARTITION BY unit, col ORDER BY k)),
agg AS (
  SELECT col, COUNT(*) AS n_rows, COUNT(DISTINCT val) AS n_distinct,
    CAST(SUM(rs) AS BIGINT) AS n_runs
  FROM runs GROUP BY col)
SELECT col, n_rows, n_distinct,
  CAST(CASE WHEN n_distinct <= 1 THEN 0
            ELSE length(bin(n_distinct - 1)) END AS INTEGER) AS dict_bits,
  n_runs,
  ROUND(CAST(n_runs AS DOUBLE) / n_rows, 6) AS runs_ratio
FROM agg"""


def compaction_plan(
    manifest: DataFrame,
    part_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner (the Delta/Iceberg ``OPTIMIZE``
    bin-packing step): within each table partition, files ordered by
    (bytes DESC, file_id ASC) are assigned to output bins by cumulative
    size — bin = floor(bytes-before-this-file / target) — so every bin
    closes as near the target size as a single-pass plan can and the
    long small-file tail coalesces into shared bins. This is the
    sorted-cumulative-sum approximation of first-fit-decreasing: one
    window pass, deterministic, no driver state, versus FFD's
    inherently sequential open-bin list.

    Input is a MANIFEST (one row per file), not the data — at 100 TB
    the planner touches metadata only (~1e6 rows for 100 MB files),
    one shuffle on the partition key + a per-partition sort window
    (sort-based, spills), then a combinable aggregate. The actual
    rewrite jobs consume the (partition, bin) groups.

    Output: one row per (partition, bin): n_files, tot_bytes,
    biggest/smallest file ids for audit. Exact integer arithmetic —
    the DuckDB twin replays it bit-for-bit."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(bytes_col).desc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    binned = manifest.withColumn(
        "bin", F.floor(before / F.lit(target_bytes)).cast("int")
    )
    return (
        binned.groupBy(part_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(bytes_col).alias("tot_bytes"),
            F.min(file_col).alias("first_file"),
            F.max(file_col).alias("last_file"),
        )
        .orderBy(part_col, "bin")
    )


def compaction_plan_sql(
    manifest_sql: str,
    part_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> str:
    """DuckDB twin of :func:`compaction_plan` over a manifest subquery."""
    return f"""
WITH m AS ({manifest_sql}),
b AS (
  SELECT {part_col}, {file_col}, {bytes_col},
    CAST(FLOOR(COALESCE(SUM({bytes_col}) OVER (
        PARTITION BY {part_col}
        ORDER BY {bytes_col} DESC, {file_col} ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      / {target_bytes}.0) AS INT) AS bin
  FROM m)
SELECT {part_col}, bin, COUNT(*) AS n_files,
  CAST(SUM({bytes_col}) AS BIGINT) AS tot_bytes,
  MIN({file_col}) AS first_file, MAX({file_col}) AS last_file
FROM b
GROUP BY {part_col}, bin
ORDER BY {part_col}, bin
"""
