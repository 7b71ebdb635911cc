"""Count-min sketch as a DataFrame aggregation.

The CMS (Cormode & Muthukrishnan 2005, "An improved data stream summary:
the count-min sketch and its applications") is the classic mergeable
frequency sketch: depth×width counters, item increments one counter per
row via independent hashes, point estimate = min over its counters
(always an overcount, never an undercount).

Spark-first shape: the counter table IS a DataFrame — build is one
explode (depth rows per input row, carrying only (row_idx, bucket)) +
one map-side-combinable groupBy count; merging sketches is a union +
re-aggregate (counters form a commutative monoid), so it distributes
and streams for free. Hashes are md5-derived (first 8 hex chars →
bigint), deterministic and engine-portable — the DuckDB oracle derives
the identical counters, unlike the engine-internal HLL/t-digest
sketches (q_approx_* are rows-only for that reason; this one
hash-matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row_idx: int, width: int) -> Column:
    """Row-seeded md5 bucket in [0, width): first 8 hex chars of
    md5('<row>:<key>') as an integer, mod width."""
    h = F.md5(F.concat(F.lit(f"{row_idx}:"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _row_buckets(key: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                _bucket(key, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the counter table (row_idx, bucket, cnt). Only non-zero
    counters materialize — at most depth × width rows after the one
    combinable shuffle, regardless of input size."""
    key = F.col(key_col).cast("string")
    return (
        df.select(F.explode(_row_buckets(key, depth, width)).alias("rb"))
        .groupBy(
            F.col("rb.row_idx").alias("row_idx"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union + re-aggregate: counters are a commutative monoid, so
    per-partition / per-day sketches combine exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for each key in `keys`: min over the key's depth
    counters (absent counter = 0). The sketch side is ≤ depth × width
    rows, so the join broadcasts; the probe never scans the raw data."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(_row_buckets(key, depth, width)).alias("rb"),
    )
    joined = probes.join(
        F.broadcast(cms),
        (probes["rb.row_idx"] == cms["row_idx"])
        & (probes["rb.bucket"] == cms["bucket"]),
        "left",
    )
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (deterministic, engine-portable)
# ---------------------------------------------------------------------------
#
# Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
# cardinality estimation algorithm". Unlike Spark's built-in
# approx_count_distinct (whose HLL++ registers are engine-internal and
# not reproducible outside the JVM), this sketch derives everything from
# md5, so a DuckDB oracle computes the identical registers and the
# identical estimate — it hash-matches, like the CMS above.
#
# Cross-engine float determinism: the harmonic-mean denominator
# sum(2^-register) is kept in INTEGER space as sum(1 << (53 - register))
# (each term ≤ 2^52, total < 2^62 — exact BIGINT arithmetic, so the sum
# is order-independent; a double accumulation would not be). The single
# final division is correctly rounded from identical operands in both
# engines, hence bitwise identical.
#
# No small-range (linear-counting) correction on purpose: it needs ln(),
# whose last-ulp behavior differs across libm implementations. The raw
# estimate is biased when n ≲ 2.5·m — documented, and irrelevant at the
# corpus cardinalities this targets (use exact count-distinct below m
# items; you do not need a sketch there).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers → ~6.5% standard error
_HLL_HASH_BITS = 60  # 15 md5 hex chars → fits BIGINT exactly
_HLL_W_BITS = _HLL_HASH_BITS - HLL_P  # 52: every 2^(bits-rho) is exact


def _hll_hash(key: Column) -> Column:
    """60-bit md5 hash (first 15 hex chars) — portable to DuckDB as
    ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group register table (group_cols..., bucket, register).

    One narrow map + one map-side-combinable max-aggregate: at most
    m=256 rows per group survive the shuffle regardless of input size —
    the 100 TB shape for distinct-count (no count-distinct re-shuffle of
    the raw keys). Registers form a commutative monoid under max, so
    per-partition / per-day sketches merge exactly (hll_merge)."""
    key = F.col(key_col).cast("string")
    h = _hll_hash(key)
    bucket = (h % HLL_M).alias("bucket")
    # shiftright, not `/`: h has up to 60 bits, a double division would
    # round away the low bits before the cast
    w = F.shiftright(h, HLL_P)
    rho = F.when(w > 0, F.lit(_HLL_W_BITS + 1) - F.length(F.bin(w))).otherwise(
        F.lit(_HLL_W_BITS + 1)
    )
    return (
        df.select(*group_cols, bucket, rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union + re-max: registers are a commutative monoid under max, so
    sketches built over disjoint (or overlapping!) slices combine into
    exactly the sketch of the union."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("bucket", "register")]
    return out.groupBy(*gcols, "bucket").agg(F.max("register").alias("register"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group: alpha_m * m^2 / sum_j 2^-M_j, the sum
    over all m registers (absent bucket = register 0 → term 1).

    Integer-space denominator: scaled_sum = Σ 1<<(53-M_j) over non-zero
    buckets + zeros·2^53 (exact BIGINT), then one double division. The
    alpha_m constant is built from the same literal arithmetic the
    oracle uses (0.7213/(1+1.079/m)) so both engines parse identical
    doubles."""
    scaled_term = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - register AS INT))")
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(scaled_term).alias("_s_nonzero"),
        F.count(F.lit(1)).alias("_n_buckets"),
    )
    zeros = F.lit(HLL_M) - F.col("_n_buckets")
    scaled_sum = (F.col("_s_nonzero") + zeros * F.expr(
        "shiftleft(CAST(1 AS BIGINT), 53)"
    )).cast("double")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    est = alpha * F.lit(float(HLL_M * HLL_M)) * F.lit(float(1 << 53)) / scaled_sum
    return per_group.select(*group_cols, F.round(est, 2).alias("hll_distinct"))


def hll_oracle_sql(
    source_sql: str, key_expr: str, group_exprs: list[str]
) -> str:
    """DuckDB twin of hll_registers→hll_estimate (same math, same
    register values, same integer-space denominator)."""
    g = ", ".join(group_exprs)
    gsel = (g + ", ") if g else ""
    h = f"('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
WITH hashed AS (
  SELECT {gsel}{h} % {HLL_M} AS bucket,
    CASE WHEN {h} // {HLL_M} > 0
         THEN {_HLL_W_BITS + 1} - length(bin({h} // {HLL_M}))
         ELSE {_HLL_W_BITS + 1} END AS rho
  FROM ({source_sql})),
regs AS (
  SELECT {gsel}bucket, MAX(rho) AS register
  FROM hashed GROUP BY {gsel}bucket),
agg AS (
  SELECT {gsel}
    SUM(CAST(1 AS BIGINT) << CAST(53 - register AS INT)) AS s_nonzero,
    COUNT(*) AS n_buckets
  FROM regs{(' GROUP BY ' + g) if g else ''})
SELECT {gsel}
  ROUND((0.7213 / (1.0 + 1.079 / {float(HLL_M)})) * {float(HLL_M * HLL_M)}
        * {float(1 << 53)}
        / CAST(s_nonzero + ({HLL_M} - n_buckets)
               * (CAST(1 AS BIGINT) << 53) AS DOUBLE), 2) AS hll_distinct
FROM agg
"""


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch (deterministic, engine-portable)
# ---------------------------------------------------------------------------
#
# The mergeable fixed-size alternative to an exact per-group sort:
# one (min, max, count) pass fixes the bin geometry, one combinable
# count-per-bin pass builds the sketch (≤ nbins rows per group survive
# the shuffle), and a quantile is read off the cumulative counts with
# linear interpolation inside the hit bin. Bin counts are integers and
# the interpolation is a single chain of correctly-rounded double ops on
# identical operands, so the DuckDB oracle reproduces the estimate
# bitwise — unlike approx_percentile's engine-internal KLL/GK sketch.
#
# Accuracy: error is bounded by one bin width, i.e. (max-min)/nbins —
# a resolution guarantee rather than a rank guarantee (t-digest/KLL give
# rank bounds but are not portable across engines deterministically).

HIST_NBINS = 128


def hist_bins(
    df: DataFrame, value_col: str, group_cols: list[str], nbins: int = HIST_NBINS
) -> DataFrame:
    """Per-group histogram (group..., bin, cnt) plus the geometry columns
    (mn, w, n). Two shuffles, both map-side combinable; the geometry join
    broadcasts (one row per group)."""
    v = F.col(value_col).cast("double")
    geom = df.groupBy(*group_cols).agg(
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
        F.count(v).alias("n"),
    ).select(
        *group_cols,
        "mn",
        "n",
        ((F.col("mx") - F.col("mn")) / F.lit(float(nbins))).alias("w"),
    )
    binned = df.filter(v.isNotNull()).join(F.broadcast(geom), group_cols).select(
        *group_cols,
        "mn",
        "w",
        "n",
        F.least(
            F.when(F.col("w") > 0, F.floor((v - F.col("mn")) / F.col("w")))
            .otherwise(F.lit(0)),
            F.lit(nbins - 1),
        ).alias("bin"),
    )
    return binned.groupBy(*group_cols, "mn", "w", "n", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_quantiles(
    hist: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Estimate every q in `qs` per group from a hist_bins() table, in
    ONE pass (one window + one aggregate over the ≤ nbins-rows-per-group
    sketch — the raw data is never touched again).

    Rank target t = q·n. The hit bin is the first whose cumulative count
    reaches t: min_by with a null-when-below-target ordering key (both
    engines' min_by/arg_min skip null ordering keys); within the bin,
    linear interpolation on the count fraction."""
    from pyspark.sql import Window

    cum = F.sum("cnt").over(
        Window.partitionBy(*group_cols).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_cum = hist.select(
        *group_cols, "mn", "w", "n", "bin", "cnt", cum.alias("cum")
    )
    aggs = []
    for q in qs:
        t = F.lit(q) * F.col("n").cast("double")
        aggs.append(
            F.min_by(
                F.struct("bin", "cnt", "cum", "mn", "w"),
                F.when(F.col("cum") >= t, F.col("bin")),
            ).alias(f"_h{int(q * 100)}")
        )
    hit = with_cum.groupBy(*group_cols, "n").agg(*aggs)
    outs = []
    for q in qs:
        hcol = F.col(f"_h{int(q * 100)}")
        t = F.lit(q) * F.col("n").cast("double")
        frac = (t - (hcol["cum"] - hcol["cnt"]).cast("double")) / hcol[
            "cnt"
        ].cast("double")
        est = hcol["mn"] + hcol["w"] * (hcol["bin"].cast("double") + frac)
        outs.append(F.round(est, 6).alias(f"hq{int(q * 100)}"))
    return hit.select(*group_cols, *outs)


def hist_quantiles_oracle_sql(
    source_sql: str,
    value_expr: str,
    group_exprs: list[str],
    qs: list[float],
    nbins: int = HIST_NBINS,
) -> str:
    """DuckDB twin of hist_bins→hist_quantiles: same bin geometry, same
    cumulative-count hit-bin selection (arg_min FILTER mirrors min_by
    with the null-below-target key), same interpolation op order."""
    g = ", ".join(group_exprs)
    gsel = (g + ", ") if g else ""
    gby = f" GROUP BY {g}" if g else ""
    hits = []
    ests = []
    for q in qs:
        name = f"h{int(q * 100)}"
        hits.append(
            f"arg_min({{'bin': bin, 'cnt': cnt, 'cum': cum, 'mn': mn, 'w': w}}, bin)"
            f" FILTER (WHERE cum >= {q!r} * n) AS {name}"
        )
        ests.append(
            f"ROUND({name}.mn + {name}.w * ({name}.bin"
            f" + ({q!r} * n - ({name}.cum - {name}.cnt)) / {name}.cnt), 6)"
            f" AS hq{int(q * 100)}"
        )
    return f"""
WITH src AS ({source_sql}),
geom AS (
  SELECT {gsel}MIN(CAST({value_expr} AS DOUBLE)) AS mn,
         (MAX(CAST({value_expr} AS DOUBLE)) - MIN(CAST({value_expr} AS DOUBLE)))
           / {float(nbins)} AS w,
         COUNT({value_expr}) AS n
  FROM src{gby}),
binned AS (
  SELECT {('s.' + ', s.'.join(group_exprs) + ', ') if g else ''}g.mn, g.w, g.n,
    LEAST(CASE WHEN g.w > 0
               THEN FLOOR((CAST({value_expr} AS DOUBLE) - g.mn) / g.w)
               ELSE 0 END, {nbins - 1}) AS bin
  FROM src s JOIN geom g ON {' AND '.join(f's.{e} IS NOT DISTINCT FROM g.{e}' for e in group_exprs) or 'TRUE'}
  WHERE s.{value_expr} IS NOT NULL),
hist AS (
  SELECT {gsel}mn, w, n, bin, COUNT(*) AS cnt,
    SUM(COUNT(*)) OVER (PARTITION BY {g if g else '1'} ORDER BY bin) AS cum
  FROM binned GROUP BY {gsel}mn, w, n, bin),
hit AS (
  SELECT {gsel}n, {', '.join(hits)}
  FROM hist GROUP BY {gsel}n)
SELECT {gsel}{', '.join(ests)}
FROM hit
"""


# ---------------------------------------------------------------------------
# Bloom filter (deterministic, engine-portable) + broadcast-bitmap pruning
# ---------------------------------------------------------------------------
#
# Bloom 1970, "Space/time trade-offs in hash coding with allowable
# errors". The set-membership sketch behind engine-side semi-join
# reduction (Spark's own spark.sql.optimizer.runtimeFilter.* injects
# exactly this shape at planning time; this is the explicit, portable
# twin). Positions are md5-derived via the same `_bucket` seed-hash the
# CMS uses, so a DuckDB oracle derives the identical bit set and the
# verdicts hash-match.
#
# Guarantees: NO false negatives ever (every inserted key's k positions
# are set); false-positive rate ≈ (1 - e^(-k·n/m))^k for n inserted
# keys — callers size m accordingly. Bits form a commutative monoid
# under OR (union+distinct here), so per-partition / per-day filters
# merge exactly.

BLOOM_K = 4
BLOOM_M = 1024


def bloom_build(
    df: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """Set-bit positions (pos) of the filter over df[key_col]: one
    narrow k-way explode + a distinct capped at m rows — the sketch
    never exceeds m rows regardless of input size."""
    key = F.col(key_col).cast("string")
    return (
        df.select(
            F.explode(
                F.array(*[_bucket(key, i, m) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union + distinct: set bits form a commutative monoid under OR,
    so filters built over disjoint (or overlapping) slices combine into
    exactly the filter of the union."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.distinct()


def bloom_bitstring(bloom: DataFrame, m: int = BLOOM_M) -> str:
    """Materialize the ≤m-row position frame as an m-char '0'/'1'
    string — the broadcast-able model artifact (m/8 bytes of real
    payload; like the IVF centroid table, this is a justified collect:
    the driver only ever sees the fixed-size sketch, never data)."""
    pos = {r["pos"] for r in bloom.collect()}
    return "".join("1" if i in pos else "0" for i in range(m))


def bloom_might_contain(
    bits: str, key: Column, k: int = BLOOM_K, m: int = BLOOM_M
) -> Column:
    """Pure narrow membership verdict against a bloom_bitstring: AND of
    k substring probes into the broadcast bit literal — zero shuffle,
    zero join on the probe side. This is the scan-side pruning shape:
    stick it in a filter() and the big table never shuffles for the
    semi-join."""
    key = key.cast("string")
    verdict = F.lit(True)
    for i in range(k):
        # substring is 1-based; _bucket yields [0, m)
        probe = F.substring(
            F.lit(bits), (_bucket(key, i, m) + 1).cast("int"), F.lit(1)
        )
        verdict = verdict & (probe == "1")
    return verdict


# floor(CDF_Poisson(λ=1)(k) · 2^20) for k = 0..5; a bucket ≥ the last
# threshold draws 6 (P(X > 6) ≈ 8.3e-5). Integer literals shared with
# the DuckDB oracle so the draw is a pure integer compare in both
# engines.
POISSON1_THRESHOLDS = (385749, 771499, 964373, 1028665, 1044738, 1047952)


def _poisson_count_from_bucket(b: Column) -> Column:
    """Map a uniform bucket in [0, 2^20) to a Poisson(1) count via the
    quantized-CDF threshold cascade (capped at 6)."""
    cnt: Column = F.lit(6)
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        cnt = F.when(b < POISSON1_THRESHOLDS[k], k).otherwise(cnt)
    return cnt


def poisson_replica_count(key: Column, rep: Column, salt: str = "boot") -> Column:
    """Deterministic, engine-portable Poisson(1) replica count for one
    (row, replicate) pair — the Poisson bootstrap's resampling draw
    (Chamandy et al. 2012). One md5 serves SIX replicates: replicate
    rep reads lane ``rep % 6`` (5 hex chars = exactly 20 bits, so the
    bucket is uniform in [0, 2^20) with no modulo) of
    md5('salt:block:key') where block = rep div 6, then compares the
    bucket against the quantized Poisson CDF thresholds. Partition-,
    run-, and engine-invariant; no float RNG anywhere — and 6× fewer
    md5 evaluations than hashing each (row, replicate) pair."""
    block = (rep.cast("long") / F.lit(6)).cast("long")
    lane = rep.cast("long") % 6
    hexstr = F.md5(
        F.concat_ws(
            ":", F.lit(salt), block.cast("string"), key.cast("string")
        )
    )
    b = F.conv(
        F.substring(hexstr, (lane * 5 + 1).cast("int"), F.lit(5)), 16, 10
    ).cast("long")
    return _poisson_count_from_bucket(b)


def poisson_rep_counts(
    df: DataFrame, id_col: str, reps: int, salt: str = "boot"
) -> DataFrame:
    """Explode ``df`` into (every input column, _rep, _cnt) rows — one
    per (row, replicate) with the replicate's deterministic Poisson(1)
    count. Draw-identical to :func:`poisson_replica_count` but shaped
    for whole-stage codegen: explode ceil(reps/6) blocks, materialize
    ONE md5 per (row, block) in a projection, then posexplode a plain
    6-element array of threshold-cascade counts (no interpreted
    higher-order lambdas, and 6× fewer md5s than hashing each
    (row, replicate) pair — 7/row for R=40, not 40)."""
    n_blocks = (reps + 5) // 6
    cols = [c for c in df.columns if c != id_col]
    blocks = df.select(
        F.col(id_col).alias("_pk"),
        *cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_blk"),
    )
    hexed = blocks.select(
        "_pk",
        *cols,
        "_blk",
        F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.col("_blk").cast("string"),
                F.col("_pk").cast("string"),
            )
        ).alias("_hex"),
    )
    lane_counts = F.array(
        *[
            _poisson_count_from_bucket(
                F.conv(F.substring("_hex", lane * 5 + 1, 5), 16, 10).cast(
                    "long"
                )
            )
            for lane in range(6)
        ]
    )
    out = hexed.select(
        F.col("_pk").alias(id_col),
        *cols,
        (F.col("_blk") * 6).alias("_blk6"),
        F.posexplode(lane_counts).alias("_lane", "_cnt"),
    ).select(
        id_col,
        *cols,
        (F.col("_blk6") + F.col("_lane")).alias("_rep"),
        "_cnt",
    )
    if reps % 6:
        out = out.filter(F.col("_rep") < reps)
    return out


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    reps: int = 40,
    salt: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group mean of
    ``value_col`` — the bootstrap that actually runs at petabyte scale:
    instead of materializing R with-replacement resamples, each row
    contributes an independent Poisson(1)-weighted copy to every
    replicate, so all R replicate means collapse into ONE map-side-
    combinable aggregate over an R-fold narrow explode (Chamandy et
    al. 2012; Kleiner et al.'s bag-of-little-bootstraps is the
    stratified cousin). Replicate means use exact round-6 decimal
    sums; the interval is the 2.5/97.5 percentile of the replicate
    means (Spark `percentile` ≡ DuckDB `quantile_cont`, p·(n−1)
    interpolation) and ``boot_se`` the exact-moment stddev.

    Output: (group, n_rows, mean_value, boot_se, ci_lo, ci_hi).

    100 TB shape: the explode carries (group, round-6 value, small-int
    count) only; shuffle = |groups|·R partial rows per partition; the
    quantile/moment pass runs over |groups|·R replicate means."""
    # values ride as exact floor-scaled micro-units (floor(round-6
    # double · 10⁶) as BIGINT — bit-identical across engines, and the
    # weighted sums stay on Spark's long-backed fast path instead of
    # per-row Decimal128 allocation; the ols2_by_group split-accumulator
    # rationale). Headroom: |Σ v·cnt·10⁶| per (group, replicate) must
    # stay under 2⁶³ — good to ~10¹² value-mass per group.
    from nashville_etl_service_backup_spark.operators import spread

    # spread: the R-fold explode + md5 draws are CPU-heavy relative to
    # the 3-column input — fan a single-split local scan out to all
    # cores (no-op when the scan already has >= defaultParallelism
    # splits, i.e. always at real scale).
    ev = spread(
        df.filter(F.col(value_col).isNotNull()).select(
            F.col(id_col).alias("_id"),
            F.col(group_col).alias("_g"),
            F.floor(F.round(value_col, 6) * F.lit(1000000.0)).alias("_v6"),
        )
    )
    d = poisson_rep_counts(ev, "_id", reps, salt)
    m = (
        d.groupBy("_g", "_rep")
        .agg(
            F.sum("_cnt").alias("_ct"),
            F.sum(F.col("_v6") * F.col("_cnt")).alias("_sv"),
        )
        .filter(F.col("_ct") > 0)
        .select(
            "_g",
            F.round(
                F.col("_sv").cast("double")
                / F.lit(1000000.0)
                / F.col("_ct").cast("double"),
                6,
            ).alias("_mr"),
        )
    )
    mr6 = F.col("_mr").cast("decimal(18,6)")
    pct = F.percentile("_mr", F.lit([0.025, 0.975]))
    ci = m.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_nrep"),
        F.round(F.element_at(pct, 1), 6).alias("ci_lo"),
        F.round(F.element_at(pct, 2), 6).alias("ci_hi"),
        F.sum(mr6).cast("double").alias("_s"),
        F.sum(mr6 * mr6).cast("double").alias("_ss"),
    )
    nrep_d = F.col("_nrep").cast("double")
    se = F.round(
        F.sqrt(
            F.greatest(
                (F.col("_ss") - F.col("_s") * F.col("_s") / nrep_d)
                / (nrep_d - F.lit(1.0)),
                F.lit(0.0),
            )
        ),
        6,
    )
    pt = ev.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum("_v6").cast("double")
            / F.lit(1000000.0)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_value"),
    )
    return (
        pt.join(F.broadcast(ci), "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            "mean_value",
            se.alias("boot_se"),
            "ci_lo",
            "ci_hi",
        )
        .orderBy(group_col)
    )
