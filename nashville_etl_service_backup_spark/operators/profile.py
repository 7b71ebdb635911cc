"""Data-quality profiling: per-column completeness / cardinality /
range stats in ONE aggregation pass (the Deequ/`ANALYZE TABLE` shape —
the generalization of the reference's per-run field-validation counters,
transform_data.py required-field checks).

Scale shape: every metric is an aggregate over the same scan — one job,
one map-side-combinable aggregate (the exact distinct counts ride
Spark's Expand operator: one shuffle total, rows multiplied by the
column count, the standard multi-count-distinct plan). The result is
exactly ``len(cols)`` rows however large the input. At 100 TB swap the
exact count_distinct for the portable HLL sketch (operators/sketch.py
``hll_registers``) column-by-column if the Expand multiplication bites;
the output contract is unchanged.

Cross-engine determinism: MIN/MAX aggregate the NATIVE values (never
pre-stringified — lexicographic order diverges from numeric order) and
only the final scalar is stringified: numerics via round(x,6) →
DECIMAL(28,6) → string (the repo-wide formula), timestamps via a
micros-precision format, everything else via plain cast; completeness
is one correctly-rounded double division of exact counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"double", "float", "int", "bigint", "smallint", "tinyint"}


def _stringify(c: Column, dtype: str) -> Column:
    """Engine-portable stringification of an aggregated scalar."""
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return F.round(c.cast("double"), 6).cast("decimal(28,6)").cast("string")
    if dtype.startswith("timestamp"):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return c.cast("string")


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null,
    completeness, n_distinct, min_val, max_val)."""
    dtypes = dict(df.dtypes)
    # two single-row aggregates, crossJoined: mixing count_distinct
    # (which Expands the input gid-ways) with string/timestamp min/max
    # (immutable agg buffers) in ONE aggregate forces a SortAggregate
    # over the expanded rows — measured 2.7 s vs <1 s at sf0.1. Split,
    # each side stays hash-based: the distinct side is counts-only
    # (mutable buffers over the Expand), the basic side is a plain
    # narrow pass.
    basic = []
    for c in cols:
        basic += [
            F.count(F.lit(1)).alias(f"_rows_{c}"),
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.min(F.col(c)).alias(f"_mn_{c}"),
            F.max(F.col(c)).alias(f"_mx_{c}"),
        ]
    nd = [F.count_distinct(F.col(c)).alias(f"_nd_{c}") for c in cols]
    one = df.agg(*basic).crossJoin(df.agg(*nd))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_rows_{c}").alias("n_rows"),
                (F.col(f"_rows_{c}") - F.col(f"_nn_{c}")).alias("n_null"),
                F.round(
                    F.col(f"_nn_{c}").cast("double")
                    / F.col(f"_rows_{c}").cast("double"),
                    6,
                ).alias("completeness"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                _stringify(F.col(f"_mn_{c}"), dtypes[c]).alias("min_val"),
                _stringify(F.col(f"_mx_{c}"), dtypes[c]).alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def mad_outliers(
    df: DataFrame, value_col: str, group_cols: list[str], k: float = 3.0
) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation
    (Hampel's rule): a point is an outlier when |x − median| >
    k · 1.4826 · MAD (1.4826 scales MAD to σ under normality; k=3 is
    the standard cut). Unlike z-scores, the median/MAD pair doesn't let
    the outliers themselves inflate the threshold.

    Two exact-percentile aggregation passes (Spark `percentile` and
    DuckDB `quantile_cont` share the p·(n−1) interpolation — parity
    proven by q_percentiles) with every intermediate rounded to 6dp so
    the engines' classification edges agree bitwise; group medians join
    back via broadcast (one row per group).

    Scale shape: exact percentile is a per-group sort — the shuffles are
    both on group_cols (AQE-coalesced); swap in the histogram-quantile
    sketch (operators/sketch.py) for the medians when per-group sorts
    are too hot at 100 TB."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("_med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_dev", F.round(F.abs(v - F.col("_med")), 6)
    )
    mad = dev.groupBy(*group_cols, "_med").agg(
        F.round(F.percentile(F.col("_dev"), F.lit(0.5)), 6).alias("_mad"),
        F.count(F.lit(1)).alias("n"),
    )
    cutoff = F.round(F.lit(k * 1.4826) * F.col("_mad"), 6)
    flagged = dev.join(
        F.broadcast(mad.select(*group_cols, "_mad")), group_cols
    ).withColumn("_cut", cutoff)
    out = flagged.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_dev") > F.col("_cut"), 1).otherwise(0)).alias(
            "n_outliers"
        ),
        F.round(F.max("_dev"), 6).alias("max_dev"),
    )
    return (
        mad.select(*group_cols, "n", F.col("_med").alias("median"),
                   F.col("_mad").alias("mad"))
        .join(out, group_cols)
    )


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/shuffle-key skew audit: the pre-flight check for the
    salting / AQE-skew-join decision (operators q_skew_salted_join).
    One combinable per-key count, then one aggregate over the (distinct
    keys)-sized count table: key count, total rows, avg/max rows per
    key, p50/p99 of the per-key distribution, and max/avg skew ratio —
    plus the heaviest key (deterministic tie-break on key value) via a
    top-1 sort of the count table, broadcast back. The raw table is
    scanned once; nothing driver-side."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    pct = F.percentile(F.col("n").cast("double"), F.lit([0.5, 0.99]))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_rows"),
        F.round(F.element_at(pct, 1), 6).alias("p50_rows"),
        F.round(F.element_at(pct, 2), 6).alias("p99_rows"),
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc(key_col))
        .limit(1)
        .select(
            F.col(key_col).cast("string").alias("top_key"),
            F.col("n").alias("top_key_rows"),
        )
    )
    return stats.join(F.broadcast(top)).select(
        "n_keys",
        "total_rows",
        F.round(
            F.col("total_rows").cast("double")
            / F.col("n_keys").cast("double"),
            6,
        ).alias("avg_rows"),
        "max_rows",
        "p50_rows",
        "p99_rows",
        F.round(
            F.col("max_rows").cast("double")
            / (F.col("total_rows").cast("double")
               / F.col("n_keys").cast("double")),
            6,
        ).alias("skew_ratio"),
        "top_key",
        "top_key_rows",
    )


def chi_square(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square independence test between two categorical
    columns: observed cell counts vs expected (row·col/n), statistic
    Σ (o−e)²/e with each term rounded to 6dp and summed in DECIMAL so
    partial-aggregation order can't move the total. One combinable
    (a,b) count + two broadcast margin joins over the tiny contingency
    table; dof = (|a|−1)(|b|−1)."""
    obs = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("o"))
    row_m = obs.groupBy(col_a).agg(F.sum("o").alias("row_n"))
    col_m = obs.groupBy(col_b).agg(F.sum("o").alias("col_n"))
    total = obs.agg(
        F.sum("o").alias("n"),
        F.count_distinct(F.col(col_a)).alias("ka"),
        F.count_distinct(F.col(col_b)).alias("kb"),
    )
    cells = (
        obs.join(F.broadcast(row_m), col_a)
        .join(F.broadcast(col_m), col_b)
        .join(F.broadcast(total))
    )
    e = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round((F.col("o").cast("double") - e) * (F.col("o") - e) / e, 6)
    return cells.groupBy("n", "ka", "kb").agg(
        F.sum(term.cast("decimal(28,6)")).cast("double").alias("chi2"),
    ).select(
        F.col("n").alias("total_rows"),
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
        "chi2",
    )


def welch_ttest(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (Welch 1947) between
    the two groups of a binary ``group_col`` (values 0/1): the A/B
    significance test for MEANS, next to q_ab_test's two-proportion z.

    Moments (n, Σv, Σv²) are computed per group in one map-side-
    combinable aggregate with DECIMAL sums (order-independent, so both
    engines see identical moments bit-for-bit); the t statistic and the
    Welch–Satterthwaite degrees of freedom are then a fixed double
    expression tree over those six exact numbers — every op singly
    rounded, cross-engine identical before the final round(6).

    Output: one row (n0, n1, mean0, mean1, t_stat, dof, significant =
    |t| > 1.96)."""
    g = F.col(group_col)
    v = F.col(value_col).cast("decimal(18,6)")
    m = df.groupBy(g.alias("_g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )
    g0 = m.filter(F.col("_g") == 0).select(
        F.col("n").alias("n0"),
        F.col("s").cast("double").alias("s0"),
        F.col("ss").cast("double").alias("ss0"),
    )
    g1 = m.filter(F.col("_g") == 1).select(
        F.col("n").alias("n1"),
        F.col("s").cast("double").alias("s1"),
        F.col("ss").cast("double").alias("ss1"),
    )
    j = g0.crossJoin(g1)
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    m0 = F.col("s0") / n0
    m1 = F.col("s1") / n1
    var0 = (F.col("ss0") - F.col("s0") * F.col("s0") / n0) / (n0 - 1)
    var1 = (F.col("ss1") - F.col("s1") * F.col("s1") / n1) / (n1 - 1)
    se0 = var0 / n0
    se1 = var1 / n1
    t = (m1 - m0) / F.sqrt(se0 + se1)
    dof = (se0 + se1) * (se0 + se1) / (
        se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)
    )
    return j.select(
        "n0",
        "n1",
        F.round(m0, 6).alias("mean0"),
        F.round(m1, 6).alias("mean1"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
        (F.abs(F.round(t, 6)) > 1.96).cast("int").alias("significant"),
    )


def key_uniqueness(df: DataFrame, cols: list[str]) -> DataFrame:
    """Candidate-key audit for a column set: total rows, distinct
    combinations, duplicate rows (n − distinct), and whether the set is
    a key. One combinable count-distinct aggregate."""
    return df.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count_distinct(*[F.col(c) for c in cols]).alias("n_distinct"),
    ).select(
        "n_groups",
        (F.col("n_groups") - F.col("n_distinct")).alias("violations"),
        (F.col("n_groups") == F.col("n_distinct")).cast("int").alias("ok"),
    )


def fd_violations(
    df: DataFrame, lhs: list[str], rhs: list[str]
) -> DataFrame:
    """Functional-dependency audit lhs → rhs: group count, number of
    lhs groups mapping to >1 distinct rhs (violations), and ok flag.
    Two combinable aggregates (per-lhs distinct-rhs, then a count) —
    the FD/consistency check of a Deequ-style data contract."""
    per = df.groupBy(*[F.col(c) for c in lhs]).agg(
        F.count_distinct(*[F.col(c) for c in rhs]).alias("_nd")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).alias("violations"),
    ).select(
        "n_groups",
        "violations",
        (F.col("violations") == 0).cast("int").alias("ok"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
) -> DataFrame:
    """Privacy re-identification audit (Sweeney 2002 k-anonymity;
    Machanavajjhala et al. 2007 l-diversity): group by the
    quasi-identifier columns and report, in ONE summary row,

      n_rows / n_groups,
      k_anon        : the smallest equivalence-class size (the dataset
                      is k-anonymous for this k),
      rows_lt_k     : rows in classes smaller than `k` (re-identifiable
                      under the chosen threshold) and their share,
      l_div_min     : the smallest per-class count of distinct
                      sensitive values,
      rows_l1       : rows in classes with a SINGLE sensitive value
                      (attribute disclosure even without
                      re-identification).

    The release gate a training-data pipeline runs before publishing
    joinable metadata — the structural complement of the regex PII
    scrub (text_pii_scrub). Two map-side-combinable shuffles: the QI
    groupBy (count + count-distinct ride one Expand pass) and the
    single-row summary."""
    g = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col(sensitive_col)).alias("l"),
    )
    lt = F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0))
    l1 = F.when(F.col("l") < 2, F.col("n")).otherwise(F.lit(0))
    return g.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").alias("k_anon"),
        F.sum(lt).alias("rows_lt_k"),
        F.round(
            F.sum(lt).cast("double") / F.sum("n").cast("double"), 6
        ).alias("pct_lt_k"),
        F.min("l").alias("l_div_min"),
        F.sum(l1).alias("rows_l1"),
    )


def forget_cascade_audit(
    events: DataFrame,
    tombstones: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    day_col: str = "ts",
) -> DataFrame:
    """Right-to-be-forgotten delete-propagation audit (the GDPR/CCPA
    erasure pass every serving pipeline needs): given a tombstone set
    of subject ids, measure the cascade through the three derived
    shapes a warehouse keeps — the raw event log (row anti-join), the
    per-user rollup (whole-key removal), and the daily aggregate
    (RETRACTION: per-day totals shrink by the tombstoned contribution;
    a day row vanishes only when all its events were the subject's).

    Output: one row per derived table — rows_before, rows_after,
    rows_removed, value_removed (exact micro-unit integer mass of the
    erased contribution, reported in value units — floor(round(v,6)*1e6)
    BIGINT sums, the repo's bit-exact cross-engine device).

    100 TB shape: the tombstone set is small relative to the corpus
    (broadcast anti-/semi-joins; no raw-side shuffle); every count/
    mass is a map-side-combinable aggregate; the daily retraction
    aggregates tombstoned rows only. This is the AUDIT; the physical
    delete is plans.load.overwrite/cdc territory (deletion vectors at
    file level in a real lakehouse)."""
    ts = F.broadcast(tombstones.select(F.col(user_col).alias("_tu")).distinct())
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.to_date(day_col).alias("_d"),
        F.floor(
            F.round(F.coalesce(F.col(value_col), F.lit(0.0)), 6)
            * F.lit(1000000.0)
        ).alias("_v6"),
    )
    hit = F.col("_tu").isNotNull()
    tagged = ev.join(ts, ev["_u"] == F.col("_tu"), "left")
    vmass = lambda cond: F.sum(  # noqa: E731
        F.when(cond, F.col("_v6")).otherwise(F.lit(0))
    )
    as_units = lambda c: F.round(  # noqa: E731
        c.cast("double") / F.lit(1000000.0), 6
    )
    # raw event log: row-level anti-join removal
    raw = tagged.agg(
        F.count(F.lit(1)).alias("rows_before"),
        F.sum((~hit).cast("long")).alias("rows_after"),
        F.sum(hit.cast("long")).alias("rows_removed"),
        as_units(vmass(hit)).alias("value_removed"),
    ).select(F.lit("events_raw").alias("table"), "*")
    # per-user rollup: whole keys disappear
    users = tagged.groupBy("_u").agg(
        F.max(hit.cast("int")).alias("_hit"),
        vmass(F.lit(True)).alias("_vm"),
    )
    user_roll = users.agg(
        F.count(F.lit(1)).alias("rows_before"),
        F.sum((F.col("_hit") == 0).cast("long")).alias("rows_after"),
        F.sum((F.col("_hit") == 1).cast("long")).alias("rows_removed"),
        as_units(
            F.sum(
                F.when(F.col("_hit") == 1, F.col("_vm")).otherwise(F.lit(0))
            )
        ).alias("value_removed"),
    ).select(F.lit("user_rollup").alias("table"), "*")
    # daily aggregate: retraction — day rows survive unless fully erased
    days = tagged.groupBy("_d").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(hit.cast("long")).alias("_nt"),
        vmass(hit).alias("_vt"),
    )
    daily = days.agg(
        F.count(F.lit(1)).alias("rows_before"),
        F.sum((F.col("_n") > F.col("_nt")).cast("long")).alias(
            "rows_after"
        ),
        F.sum((F.col("_n") == F.col("_nt")).cast("long")).alias(
            "rows_removed"
        ),
        as_units(F.sum("_vt")).alias("value_removed"),
    ).select(F.lit("daily_rollup").alias("table"), "*")
    return raw.unionAll(user_roll).unionAll(daily)


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private count release (Dwork et al. 2006 Laplace
    mechanism): per-group counts + Laplace(1/ε) noise — counting
    queries have sensitivity 1, so scale b = 1/ε. The third leg of the
    governance family (k_anonymity = structural audit,
    forget_cascade_audit = erasure, this = private release).

    Engine-portable noise: the uniform draw is the salted md5 bucket
    of the group key mapped to u = (bucket + 0.5) / 2^20 ∈ (0,1) — a
    dyadic rational, exactly representable — and the Laplace deviate
    is the inverse CDF −b·sign(u−½)·ln(1−2|u−½|), its ln rounded to 9
    decimals (the repo's cross-engine ln device; 1−2|u−½| is again an
    exact dyadic rational, never 0 thanks to the +0.5 offset). No
    float RNG; re-releases are deterministic per salt — REUSING a salt
    for two releases of the same key spends no extra privacy budget
    but releasing with two salts composes (2ε), which is the caller's
    ledger to keep.

    SECURITY CAVEAT — the salt is part of the secret: because the
    noise is a deterministic function of (salt, group key), an
    adversary who learns the salt can recompute each group's Laplace
    deviate exactly and subtract it, recovering the true counts — the
    ε guarantee holds only while the salt stays private (treat it like
    a key-derivation secret, not a config value). A production release
    wanting public-parameter safety needs genuinely random noise drawn
    once and never re-derivable; this deterministic form exists so the
    release is engine-portable and oracle-auditable.

    Output: (group, n_true, noise, n_noisy) — n_true rides along
    because this engine's releases are oracle-audited; a production
    release would project it away.

    100 TB shape: ONE map-side-combinable count shuffled on the group
    key; the noise is a narrow per-row expression over the |groups|
    aggregate rows."""
    from nashville_etl_service_backup_spark.operators.text_analysis import (
        hash_bucket,
    )

    b = 1.0 / float(epsilon)
    counts = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    u = (
        hash_bucket(
            F.concat_ws(":", F.lit(salt), F.col(group_col).cast("string")),
            1_048_576,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(1048576.0)
    centered = u - F.lit(0.5)
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(centered)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.round(F.log(mag), 9)
    )
    return counts.select(
        group_col,
        "n_true",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
    ).orderBy(group_col)
