"""Behavioral / product-analytics shapes over the `events` stream table:
ordered conversion funnel, weekly cohort retention, value histogram, and
statistical aggregates. These extend SURVEY §2.5's aggregation surface
(the reference only counts and DISTINCTs — db_extractor.py:28-50) with
the event-analytics queries a serving layer over the same data would
grow next, each designed for 100 TB operation:

- the funnel never materializes per-user event lists: each stage is a
  filtered scan (event_type predicate pushed to parquet) joined to the
  previous stage's one-row-per-user frame on user_id — frames shrink
  monotonically down the funnel, and the join key is the natural
  partitioning for the whole chain (one co-partitioned shuffle reused);
- cohort retention shuffles only (user_id, day) pairs after an early
  per-partition DISTINCT, never raw events;
- the histogram is a pure map-side-combinable groupBy on a computed
  bucket key (no sort, no window);
- stats aggregates (stddev/var/corr/covar) are single-pass
  moment-based and map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.queries._util import dsum
from nashville_etl_service_backup_spark.tables import load

# Ordered funnel: each later stage must happen strictly after the
# user's earliest qualifying event of the previous stage.
FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup→view→click→purchase.

    Stage k keeps users whose earliest stage-k event is strictly after
    their stage-(k-1) timestamp (sequential conditional aggregation —
    the standard distributed funnel; no per-user arrays, no windows
    over the full event stream)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    cur = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    per_stage = []
    for i, stage in enumerate(FUNNEL_STAGES):
        if i:
            cur = (
                ev.filter(F.col("event_type") == stage)
                .join(
                    cur.select("user_id", F.col("t").alias("prev_t")),
                    "user_id",
                )
                .filter(F.col("ts") > F.col("prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        per_stage.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
    out = per_stage[0]
    for f in per_stage[1:]:
        out = out.unionByName(f)
    w = Window.orderBy("stage_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.withColumn(
        "pct_of_top",
        F.round(F.col("n_users") / F.first("n_users").over(w), 6),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users cohorted by first-active day;
    n_active = distinct users of that cohort active in week-offset k
    (floor(days-since-cohort-day / 7) — explicit math, no engine week
    conventions); retention = n_active / cohort size (offset-0 row is
    guaranteed: every user is active on their own first day)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    act = ev.distinct()
    ret = (
        act.join(first, "user_id")
        .select(
            "user_id",
            "d0",
            F.floor(F.datediff(F.col("d"), F.col("d0")) / 7).alias(
                "week_offset"
            ),
        )
        .groupBy("d0", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    w = Window.partitionBy("d0").orderBy("week_offset")
    return ret.select(
        F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active") / F.first("n_active").over(w), 6
        ).alias("retention"),
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event value per type: 20 buckets of
    width 25 over [0, 500), top bucket clamps the tail. Explicit floor
    math (identical expression in the oracle) rather than width_bucket —
    portable and a pure map-side-combinable groupBy."""
    ev = load(spark, sf_dir, "events")
    b = F.greatest(
        F.least(F.floor(F.col("value") / F.lit(25.0)), F.lit(19)), F.lit(0)
    )
    return (
        ev.groupBy("event_type", b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), scale=6).alias("sum_value"),
        )
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * 25.0).alias("bucket_lo"),
            "n",
            "sum_value",
        )
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per lineitem group: sample stddev/variance,
    Pearson correlation, sample covariance — single-pass moment-based
    aggregates, rounded so Spark's and DuckDB's (both numerically
    stable, different update orders) last-ulp drift cannot surface."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )




def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    (previous event type → next event type) pair, the transition count
    and row-normalized probability. One window shuffle on user_id (LAG
    over the per-user timeline) + one combinable pair-count + a per-prev
    normalizing window over the tiny |types|² matrix. The
    path-analytics upgrade of q_funnel's fixed-order steps."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(total).cast("double"),
            6,
        ).alias("prob"),
    ).orderBy("prev_type", "next_type")




def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: for every user whose first purchase follows
    their first signup, the signup→purchase delay — p25/p50/p90 in
    exact integer seconds per 4-way cohort, plus converter counts.
    Two combinable min-aggregations + one broadcast-joined filter; the
    percentile runs over the (converters)-sized delay table, never the
    event stream."""
    ev = load(spark, sf_dir, "events")
    first_ev = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .pivot("event_type", ["signup", "purchase"])
        .agg(F.min("ts"))
    )
    conv = first_ev.filter(
        F.col("signup").isNotNull()
        & F.col("purchase").isNotNull()
        & (F.col("purchase") > F.col("signup"))
    ).select(
        (F.col("user_id") % 4).cast("long").alias("cohort"),
        (
            F.unix_micros(F.col("purchase")) - F.unix_micros(F.col("signup"))
        ).alias("delay_us"),
    )
    pct = F.percentile(F.col("delay_us").cast("double"), F.lit([0.25, 0.5, 0.9]))
    return (
        conv.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_converters"),
            F.round(F.element_at(pct, 1) / F.lit(1e6), 3).alias("p25_sec"),
            F.round(F.element_at(pct, 2) / F.lit(1e6), 3).alias("p50_sec"),
            F.round(F.element_at(pct, 3) / F.lit(1e6), 3).alias("p90_sec"),
        )
        .orderBy("cohort")
    )




def q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermark semantics as an auditable batch twin: events
    arrive with a deterministic md5 jitter (0–30 min) after their event
    time, grouped into hourly ARRIVAL batches; the watermark at each
    batch is (max event-time over all STRICTLY EARLIER batches) − 10
    min, and an event is late if its event time trails that watermark —
    exactly the applyInPandasWithState/withWatermark drop rule the
    streaming pipeline enforces (streaming/pipeline.py), made
    oracle-checkable. Scale shape: per-batch max is combinable, the
    running max runs over the tiny batch table, and the classification
    join broadcasts it back; per event-time day: totals, late counts,
    late fraction."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    jitter = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(1800 * 1000 * 1000)
    )
    abatch = F.floor((us + jitter) / F.lit(3600 * 1000 * 1000)).alias(
        "abatch"
    )
    tagged = ev.select(
        F.to_date("ts").alias("day"), us.alias("ev_us"), abatch
    )
    bmax = tagged.groupBy("abatch").agg(F.max("ev_us").alias("bmax"))
    w = Window.orderBy("abatch").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = bmax.select(
        "abatch",
        (F.max("bmax").over(w) - F.lit(600 * 1000 * 1000)).alias("wm"),
    )
    flagged = tagged.join(F.broadcast(wm), "abatch").select(
        "day",
        F.when(F.col("ev_us") < F.col("wm"), 1).otherwise(0).alias("late"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("late").alias("n_late"),
            F.round(
                F.sum("late").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("late_frac"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "n_late",
            "late_frac",
        )
        .orderBy("day")
    )




def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: sessionize each user's timeline with the
    manual lag-gap-cumsum pattern (10-min inactivity — the hand-rolled
    twin of F.session_window, needed whenever the session rule is
    richer than a fixed gap), take each session's first three event
    types as a '>'-joined path, and rank the top-10 paths by session
    count. One user-window shuffle does the lag AND the running
    session-id sum; the path aggregate is combinable."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 10 * 60 * 1000 * 1000
    new_sess = F.when(
        F.unix_micros(F.col("ts"))
        - F.unix_micros(F.lag("ts").over(w)) > gap_us,
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )
    sw = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    first3 = (
        sess.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("steps")
        )
        .select(
            F.concat_ws(
                ">", F.transform("steps", lambda t: t["event_type"])
            ).alias("path")
        )
    )
    return (
        first3.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )




def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test on purchase conversion between the
    user_id-parity variants: per-variant user and converter counts
    (one distinct aggregate), then the pooled-variance z statistic —
    sqrt is IEEE-correctly-rounded so the statistic is bit-identical
    cross-engine (the chi-square's 2×2 companion; z² ≈ χ²)."""
    ev = load(spark, sf_dir, "events")
    users = (
        ev.groupBy((F.col("user_id") % 2).cast("long").alias("variant"),
                   F.col("user_id"))
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150.0),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    per = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    a = per.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = per.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    j = a.join(b)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("c_a").cast("double"), F.col("c_b").cast("double")
    p_pool = (ca + cb) / (na + nb)
    se = F.sqrt(p_pool * (F.lit(1.0) - p_pool)
                * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return j.select(
        "n_a", "c_a", "n_b", "c_b",
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round((ca / na - cb / nb) / se, 6).alias("z_score"),
    )




def q_discovery_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog discovery curve: after k events, how many DISTINCT event
    types has the average user touched? First-occurrence flags (one
    row_number window over (user, type)) cumulatively summed along each
    user's timeline (second window, same user shuffle partitioning),
    then the cross-user mean at each position k ≤ 20 — the
    content-coverage diagnostic behind recommendation-diversity work."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(wt) == 1, 1).otherwise(0).alias("first"),
    )
    curve = flagged.select(
        F.row_number().over(wu).cast("long").alias("k"),
        F.sum("first")
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("n_types"),
    ).filter(F.col("k") <= 20)
    return (
        curve.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("n_types").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_distinct_types"),
        )
        .orderBy("k")
    )


QUERIES = {
    "q_markov_transitions": q_markov_transitions,
    "q_time_to_convert": q_time_to_convert,
    "q_late_data_audit": q_late_data_audit,
    "q_session_paths": q_session_paths,
    "q_ab_test": q_ab_test,
    "q_discovery_curve": q_discovery_curve,
    "q_funnel": q_funnel,
    "q_cohort_retention": q_cohort_retention,
    "q_value_histogram": q_value_histogram,
    "q_stats_agg": q_stats_agg,
}


_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id,
    LAG(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_type,
    event_type AS next_type
  FROM events),
pairs AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type)
SELECT prev_type, next_type, n_transitions,
  ROUND(CAST(n_transitions AS DOUBLE)
        / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE),
        6) AS prob
FROM pairs
ORDER BY prev_type, next_type
"""



_TTC_ORACLE = """
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
  FROM events GROUP BY user_id),
conv AS (
  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
    epoch_us(p) - epoch_us(s) AS delay_us
  FROM firsts WHERE s IS NOT NULL AND p IS NOT NULL AND p > s)
SELECT cohort, COUNT(*) AS n_converters,
  ROUND(quantile_cont(CAST(delay_us AS DOUBLE), 0.25) / 1000000.0, 3)
    AS p25_sec,
  ROUND(quantile_cont(CAST(delay_us AS DOUBLE), 0.5) / 1000000.0, 3)
    AS p50_sec,
  ROUND(quantile_cont(CAST(delay_us AS DOUBLE), 0.9) / 1000000.0, 3)
    AS p90_sec
FROM conv GROUP BY cohort ORDER BY cohort
"""



_LATE_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, epoch_us(CAST(ts AS TIMESTAMP)) AS ev_us,
    (epoch_us(CAST(ts AS TIMESTAMP))
     + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
       % 1800000000) // 3600000000 AS abatch
  FROM events),
bmax AS (SELECT abatch, MAX(ev_us) AS bmax FROM ev GROUP BY abatch),
wm AS (
  SELECT abatch,
    MAX(bmax) OVER (ORDER BY abatch
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      - 600000000 AS wm
  FROM bmax),
flagged AS (
  SELECT e.day, CASE WHEN e.ev_us < w.wm THEN 1 ELSE 0 END AS late
  FROM ev e JOIN wm w USING (abatch))
SELECT strftime(day, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
  CAST(SUM(late) AS BIGINT) AS n_late,
  ROUND(CAST(SUM(late) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS late_frac
FROM flagged GROUP BY day ORDER BY day
"""



_PATHS_ORACLE = """
WITH lagd AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
           - epoch_us(CAST(LAG(ts) OVER w AS TIMESTAMP)) > 600000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM lagd),
first3 AS (
  SELECT user_id, session_id, event_type, rn FROM (
    SELECT user_id, session_id, event_type,
      ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                         ORDER BY ts, event_id) AS rn
    FROM sess) WHERE rn <= 3),
paths AS (
  SELECT string_agg(event_type, '>' ORDER BY rn) AS path
  FROM first3 GROUP BY user_id, session_id)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 10
"""



_AB_ORACLE = """
WITH users AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS variant, user_id,
    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2),
per AS (
  SELECT variant, COUNT(*) AS n_users,
    CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM users GROUP BY variant),
a AS (SELECT n_users AS n_a, n_converted AS c_a FROM per WHERE variant = 0),
b AS (SELECT n_users AS n_b, n_converted AS c_b FROM per WHERE variant = 1)
SELECT n_a, c_a, n_b, c_b,
  ROUND(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
  ROUND(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
  ROUND(
    (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
     - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
    / sqrt(((CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE))
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
           * (1.0 - (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE))
                    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
           * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
    AS z_score
FROM a CROSS JOIN b
"""



_DISCOVERY_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) = 1
         THEN 1 ELSE 0 END AS first
  FROM events),
curve AS (
  SELECT ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS k,
    SUM(first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS n_types
  FROM flagged)
SELECT k, COUNT(*) AS n_users,
  ROUND(CAST(SUM(n_types) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS avg_distinct_types
FROM curve WHERE k <= 20 GROUP BY k ORDER BY k
"""


ORACLES = {
    "q_markov_transitions": _MARKOV_ORACLE,
    "q_time_to_convert": _TTC_ORACLE,
    "q_late_data_audit": _LATE_ORACLE,
    "q_session_paths": _PATHS_ORACLE,
    "q_ab_test": _AB_ORACLE,
    "q_discovery_curve": _DISCOVERY_ORACLE,
    "q_funnel": """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id),
c AS (
  SELECT 1 AS stage_idx, 'signup' AS stage, count(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'view', count(*) FROM s2
  UNION ALL SELECT 3, 'click', count(*) FROM s3
  UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
SELECT stage_idx, stage, n_users,
  ROUND(CAST(n_users AS DOUBLE)
        / first_value(n_users) OVER (ORDER BY stage_idx), 6) AS pct_of_top
FROM c
""",
    "q_cohort_retention": """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
r AS (
  SELECT f.d0,
         CAST(floor(date_diff('day', f.d0, a.d) / 7.0) AS BIGINT)
           AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM a JOIN f ON a.user_id = f.user_id
  GROUP BY 1, 2)
SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, week_offset, n_active,
  ROUND(CAST(n_active AS DOUBLE)
        / first_value(n_active)
            OVER (PARTITION BY d0 ORDER BY week_offset), 6) AS retention
FROM r
""",
    "q_value_histogram": """
SELECT event_type,
  GREATEST(LEAST(CAST(floor(value / 25.0) AS BIGINT), 19), 0) AS bucket,
  CAST(GREATEST(LEAST(CAST(floor(value / 25.0) AS BIGINT), 19), 0) * 25.0
    AS DOUBLE) AS bucket_lo,
  count(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
    "q_stats_agg": """
SELECT l_returnflag, l_linestatus, count(*) AS n,
  ROUND(stddev_samp(l_quantity), 6) AS std_qty,
  ROUND(var_samp(l_quantity), 6) AS var_qty,
  ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  ROUND(covar_samp(l_quantity, l_extendedprice), 3) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
}


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimate of time-to-first-purchase (Kaplan & Meier
    1958) — the censoring-aware upgrade of q_time_to_convert, which
    silently drops never-converters: t = days from a user's first
    event to their first purchase; users with no purchase are RIGHT-
    CENSORED at the corpus end (their conversion time is only known to
    exceed the observation window). Per distinct t: the risk set size
    (a cumulative window over the tiny duration histogram — never the
    event table), conversions d, censored exits, the hazard
    d/n_at_risk, and the product-limit survival Π(1 − d/n) evaluated
    as exp of an exact-decimal sum of round-6 ln factors (the BM25 ln
    device; an explicit zero-factor flag handles S → 0 exactly).
    100 TB shape: one per-user conditional min/max aggregate over the
    scan, then every window runs on the ≤|days| histogram rows."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("first_d"),
        F.min(F.when(F.col("is_p"), F.col("day"))).alias("conv_d"),
    )
    maxd = ev.agg(F.max("day").alias("max_d"))
    u = per_user.crossJoin(F.broadcast(maxd)).select(
        F.when(
            F.col("conv_d").isNotNull(),
            F.datediff("conv_d", "first_d"),
        )
        .otherwise(F.datediff("max_d", "first_d"))
        .alias("t"),
        F.col("conv_d").isNotNull().cast("int").alias("ev"),
    )
    h = u.groupBy("t").agg(
        F.sum("ev").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).alias("c"),
    )
    tot = u.agg(F.count(F.lit(1)).alias("n_tot"))
    wprev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcur = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    base = h.crossJoin(F.broadcast(tot)).withColumn(
        "n_at_risk",
        F.col("n_tot")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)),
    )
    dd = F.col("d").cast("double")
    nn = F.col("n_at_risk").cast("double")
    base = base.withColumn(
        "lnf",
        F.when(
            F.col("d") < F.col("n_at_risk"),
            F.round(F.log(F.lit(1.0) - dd / nn), 6),
        ),
    ).withColumn(
        "zero",
        F.max(
            F.when(F.col("d") >= F.col("n_at_risk"), 1).otherwise(0)
        ).over(wcur),
    )
    surv = F.when(F.col("zero") == 1, F.lit(0.0)).otherwise(
        F.round(
            F.exp(
                F.sum(F.col("lnf").cast("decimal(28,6)"))
                .over(wcur)
                .cast("double")
            ),
            6,
        )
    )
    return base.select(
        F.col("t").alias("days_to_convert"),
        "n_at_risk",
        F.col("d").alias("n_converted"),
        F.col("c").alias("n_censored"),
        F.round(dd / nn, 6).alias("hazard"),
        surv.alias("survival"),
    ).orderBy("days_to_convert")


QUERIES["q_survival_km"] = q_survival_km

ORACLES["q_survival_km"] = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
  event_type = 'purchase' AS is_p FROM events),
pu AS (SELECT user_id, MIN(day) AS first_d,
  MIN(CASE WHEN is_p THEN day END) AS conv_d FROM ev GROUP BY 1),
mx AS (SELECT MAX(day) AS max_d FROM ev),
u AS (SELECT CASE WHEN conv_d IS NOT NULL
    THEN date_diff('day', first_d, conv_d)
    ELSE date_diff('day', first_d, max_d) END AS t,
  CASE WHEN conv_d IS NOT NULL THEN 1 ELSE 0 END AS e
 FROM pu, mx),
h AS (SELECT t, CAST(SUM(e) AS BIGINT) AS d,
  CAST(SUM(1 - e) AS BIGINT) AS c FROM u GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_tot FROM u),
b AS (SELECT t, d, c,
  n_tot - COALESCE(SUM(d + c) OVER (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
 FROM h, tot),
b2 AS (SELECT t, d, c, n_at_risk,
  CASE WHEN d < n_at_risk
    THEN ROUND(LN(1.0 - CAST(d AS DOUBLE)/CAST(n_at_risk AS DOUBLE)), 6)
  END AS lnf,
  MAX(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zero
 FROM b),
b3 AS (SELECT t, d, c, n_at_risk, zero,
  CAST(SUM(CAST(lnf AS DECIMAL(28,6))) OVER (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ls
 FROM b2)
SELECT t AS days_to_convert,
  CAST(n_at_risk AS BIGINT) AS n_at_risk,
  d AS n_converted, c AS n_censored,
  ROUND(CAST(d AS DOUBLE)/CAST(n_at_risk AS DOUBLE), 6) AS hazard,
  CASE WHEN zero = 1 THEN 0.0 ELSE ROUND(EXP(ls), 6) END AS survival
FROM b3 ORDER BY days_to_convert
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events: per-user
    recency (days since last purchase at corpus end), frequency
    (purchase count), monetary (exact decimal value sum), quintile
    scores assigned by BINNING AGAINST BROADCAST PERCENTILE EDGES
    (p20/p40/p60/p80 from one aggregate over the per-user table —
    never an ntile global sort over users, which a 100 TB user base
    would pay for), and the classic named segments (champions /
    loyal / at-risk / hibernating) as deterministic CASE rules.
    Spark `percentile` and DuckDB `quantile_cont` share the p·(n−1)
    interpolation (q_percentiles precedent); edges and metrics are
    round-6 and bin comparisons strict, so both engines segment
    identically."""
    ev = load(spark, sf_dir, "events")
    maxd = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.round(
                F.sum(
                    F.round(F.col("value"), 6).cast("decimal(18,6)")
                ).cast("double"),
                6,
            ).alias("money"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            F.datediff("max_d", "last_d").cast("double").alias("rec"),
            F.col("freq").cast("double").alias("freq"),
            "money",
        )
    )
    qs = F.lit([0.2, 0.4, 0.6, 0.8])
    edges = pu.agg(
        *[
            F.round(
                F.element_at(F.percentile(m, qs), i), 6
            ).alias(f"{m}_e{i}")
            for m in ("rec", "freq", "money")
            for i in range(1, 5)
        ]
    )

    def score(m: str) -> F.Column:
        s = F.lit(1)
        for i in range(1, 5):
            s = s + (F.col(m) > F.col(f"{m}_e{i}")).cast("int")
        return s

    scored = pu.crossJoin(F.broadcast(edges)).select(
        "user_id",
        "money",
        (F.lit(6) - score("rec")).alias("r_score"),
        score("freq").alias("f_score"),
        score("money").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            F.lit("champions"),
        )
        .when(
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3),
            F.lit("loyal"),
        )
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") >= 3),
            F.lit("at_risk"),
        )
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2),
            F.lit("hibernating"),
        )
        .otherwise(F.lit("other"))
    )
    return (
        scored.withColumn("segment", seg)
        .groupBy("segment", "r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum(
                    F.round(F.col("money"), 6).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_monetary"),
        )
        .orderBy("segment", "r_score", "f_score", "m_score")
    )


QUERIES["q_rfm_segments"] = q_rfm_segments

ORACLES["q_rfm_segments"] = """
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events),
pu AS (SELECT user_id,
  CAST(date_diff('day', MAX(CAST(ts AS DATE)), ANY_VALUE(mx.max_d))
    AS DOUBLE) AS rec,
  CAST(COUNT(*) AS DOUBLE) AS freq,
  ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
    AS money
 FROM events, mx WHERE event_type = 'purchase' GROUP BY user_id),
e AS (SELECT
  ROUND(quantile_cont(rec, 0.2), 6) AS rec_e1,
  ROUND(quantile_cont(rec, 0.4), 6) AS rec_e2,
  ROUND(quantile_cont(rec, 0.6), 6) AS rec_e3,
  ROUND(quantile_cont(rec, 0.8), 6) AS rec_e4,
  ROUND(quantile_cont(freq, 0.2), 6) AS freq_e1,
  ROUND(quantile_cont(freq, 0.4), 6) AS freq_e2,
  ROUND(quantile_cont(freq, 0.6), 6) AS freq_e3,
  ROUND(quantile_cont(freq, 0.8), 6) AS freq_e4,
  ROUND(quantile_cont(money, 0.2), 6) AS money_e1,
  ROUND(quantile_cont(money, 0.4), 6) AS money_e2,
  ROUND(quantile_cont(money, 0.6), 6) AS money_e3,
  ROUND(quantile_cont(money, 0.8), 6) AS money_e4
 FROM pu),
s AS (SELECT user_id, money,
  6 - (1 + CASE WHEN rec > rec_e1 THEN 1 ELSE 0 END
         + CASE WHEN rec > rec_e2 THEN 1 ELSE 0 END
         + CASE WHEN rec > rec_e3 THEN 1 ELSE 0 END
         + CASE WHEN rec > rec_e4 THEN 1 ELSE 0 END) AS r_score,
  1 + CASE WHEN freq > freq_e1 THEN 1 ELSE 0 END
    + CASE WHEN freq > freq_e2 THEN 1 ELSE 0 END
    + CASE WHEN freq > freq_e3 THEN 1 ELSE 0 END
    + CASE WHEN freq > freq_e4 THEN 1 ELSE 0 END AS f_score,
  1 + CASE WHEN money > money_e1 THEN 1 ELSE 0 END
    + CASE WHEN money > money_e2 THEN 1 ELSE 0 END
    + CASE WHEN money > money_e3 THEN 1 ELSE 0 END
    + CASE WHEN money > money_e4 THEN 1 ELSE 0 END AS m_score
 FROM pu, e)
SELECT CASE
    WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      THEN 'champions'
    WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
    ELSE 'other' END AS segment,
  CAST(r_score AS INTEGER) AS r_score,
  CAST(f_score AS INTEGER) AS f_score,
  CAST(m_score AS INTEGER) AS m_score,
  COUNT(*) AS n_users,
  ROUND(CAST(SUM(CAST(ROUND(money, 6) AS DECIMAL(18,6))) AS DOUBLE)
    /COUNT(*), 6) AS avg_monetary
FROM s GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution of purchase value to the
    touch events preceding it: for every purchase, the same user's
    non-purchase events in the prior 7 days are its touches; value is
    credited per event type under THREE models at once — linear (value
    / n_touches per touch), first-touch, last-touch (min/max struct
    over (ts, type): among duplicate touches the pick is ambiguous but
    the per-type aggregate is not). The touch join is the watermarked
    stream-stream attribution join's batch twin: an equi-join on
    user_id with a range conjunct, never a cross product; credits are
    round-6 decimal sums so the split is exact. Output: per event
    type, touches, attributed value under each model."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").alias("ets"),
        F.col("value").alias("v"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ets").alias("p_ts"),
        F.round(F.col("v"), 6).alias("p_val"),
    )
    touches = ev.filter(F.col("event_type") != "purchase")
    j = purchases.join(
        touches,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("ets") < F.col("p_ts"))
        & (F.col("ets") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    per_p = j.groupBy("p_user", "p_ts", "p_val").agg(
        F.count(F.lit(1)).alias("n_touch"),
        F.min(F.struct(F.col("ets"), F.col("event_type"))).alias("ft"),
        F.max(F.struct(F.col("ets"), F.col("event_type"))).alias("lt"),
    )
    lin = (
        j.join(
            F.broadcast(
                per_p.select("p_user", "p_ts", "n_touch")
            ),
            ["p_user", "p_ts"],
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(
                F.round(
                    F.col("p_val") / F.col("n_touch").cast("double"), 6
                ).cast("decimal(28,6)")
            ).alias("_lin"),
        )
    )
    first = per_p.groupBy(F.col("ft.event_type").alias("event_type")).agg(
        F.sum(F.col("p_val").cast("decimal(28,6)")).alias("_first")
    )
    last = per_p.groupBy(F.col("lt.event_type").alias("event_type")).agg(
        F.sum(F.col("p_val").cast("decimal(28,6)")).alias("_last")
    )
    return (
        lin.join(first, "event_type", "left")
        .join(last, "event_type", "left")
        .select(
            "event_type",
            "n_touches",
            F.round(F.col("_lin").cast("double"), 2).alias("linear_value"),
            F.round(
                F.coalesce(F.col("_first"), F.lit(0)).cast("double"), 2
            ).alias("first_touch_value"),
            F.round(
                F.coalesce(F.col("_last"), F.lit(0)).cast("double"), 2
            ).alias("last_touch_value"),
        )
        .orderBy("event_type")
    )


QUERIES["q_attribution"] = q_attribution

ORACLES["q_attribution"] = """
WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ets,
  value AS v FROM events),
p AS (SELECT user_id AS p_user, ets AS p_ts, ROUND(v, 6) AS p_val
 FROM ev WHERE event_type = 'purchase'),
t AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
j AS (SELECT p.p_user, p.p_ts, p.p_val, t.event_type, t.ets
 FROM p JOIN t ON p.p_user = t.user_id
  AND t.ets < p.p_ts AND t.ets >= p.p_ts - INTERVAL 7 DAY),
per_p AS (SELECT p_user, p_ts, p_val, COUNT(*) AS n_touch,
  MIN({'ts': ets, 'et': event_type}) AS ft,
  MAX({'ts': ets, 'et': event_type}) AS lt
 FROM j GROUP BY 1, 2, 3),
lin AS (SELECT j.event_type, COUNT(*) AS n_touches,
  SUM(CAST(ROUND(j.p_val/CAST(pp.n_touch AS DOUBLE), 6)
    AS DECIMAL(28,6))) AS _lin
 FROM j JOIN per_p pp ON j.p_user = pp.p_user AND j.p_ts = pp.p_ts
 GROUP BY 1),
f AS (SELECT ft.et AS event_type,
  SUM(CAST(p_val AS DECIMAL(28,6))) AS _first FROM per_p GROUP BY 1),
l AS (SELECT lt.et AS event_type,
  SUM(CAST(p_val AS DECIMAL(28,6))) AS _last FROM per_p GROUP BY 1)
SELECT lin.event_type, n_touches,
  ROUND(CAST(_lin AS DOUBLE), 2) AS linear_value,
  ROUND(CAST(COALESCE(_first, 0) AS DOUBLE), 2) AS first_touch_value,
  ROUND(CAST(COALESCE(_last, 0) AS DOUBLE), 2) AS last_touch_value
FROM lin LEFT JOIN f ON lin.event_type = f.event_type
LEFT JOIN l ON lin.event_type = l.event_type
ORDER BY lin.event_type
"""


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value
    per event_type (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams" — the Google formulation; Kleiner et al.'s
    BLB is the heavier cousin): classical bootstrap resampling draws
    n rows WITH replacement per replicate, which a distributed engine
    cannot do without materializing the sample — the Poisson trick
    replaces each row's multinomial replica count with an independent
    Poisson(1) draw, so every replicate becomes a weighted pass over
    the SAME scan and all R replicates fit in ONE map-side-combinable
    aggregate over an R-fold narrow explode.

    Engine-portable randomness: each (event, replicate) draws its
    Poisson(1) count by comparing a blocked-lane md5 bucket — replicate
    r reads lane r%6 (5 hex chars = exactly 20 bits, so the bucket is
    uniform in [0, 2^20) with no modulo) of md5('boot:r//6:event_id'),
    ONE md5 serving six replicates (7 md5s/row for R=40, not 40) —
    against the Poisson CDF quantized to integer thresholds out of
    1,048,576 (floor(CDF·2^20) literals inlined on BOTH sides — pure
    integer compares, no float RNG), capped at 6 (P(X>6) ≈ 8e-5). Replicate means use exact decimal sums; the CI
    is the 2.5/97.5 percentile of the R=40 replicate means (shared
    p·(n−1) interpolation) and boot_se the exact-moment stddev.

    100 TB shape: explode ×40 of a 3-column projection (type, round-6
    value, small-int count) into one combinable groupBy — shuffle
    carries |types|·R partial rows per partition; the percentile/
    moment pass runs over |types|·R replicate means. The bootstrap
    that actually runs at petabyte scale."""
    from nashville_etl_service_backup_spark.operators.sketch import (
        poisson_bootstrap_ci,
    )

    return poisson_bootstrap_ci(
        load(spark, sf_dir, "events"),
        id_col="event_id",
        group_col="event_type",
        value_col="value",
        reps=40,
    ).withColumnRenamed("n_rows", "n_events")


QUERIES["q_bootstrap_ci"] = q_bootstrap_ci

# blocked-lane salted md5-hex -> bucket in [0, 1048576): replicate
# rep reads lane rep%6 (5 hex chars = exactly 20 bits, no modulo) of
# md5('boot:' || rep//6 || ':' || event_id) — mirroring poisson_draws
# (operators/sketch.py) exactly: ONE md5 serves six replicates
_BOOT_BUCKET_SQL = """CAST(list_sum(list_transform(range(1, 6), i ->
      (strpos('0123456789abcdef',
              substr(md5('boot:' || CAST(rep // 6 AS VARCHAR) || ':'
                     || CAST(event_id AS VARCHAR)),
                     CAST((rep % 6) * 5 + i AS INT), 1)) - 1)
      * pow(16, 5 - i))) AS BIGINT)"""

ORACLES["q_bootstrap_ci"] = f"""
WITH ev AS (SELECT event_id, event_type,
  CAST(FLOOR(ROUND(value, 6) * 1000000.0) AS BIGINT) AS v6
 FROM events WHERE value IS NOT NULL),
d AS (SELECT event_id, event_type, v6, CAST(r.rep AS INT) AS rep
 FROM ev, (SELECT unnest(range(40)) AS rep) r),
c AS (SELECT event_type, rep, v6,
  CASE WHEN b < 385749 THEN 0 WHEN b < 771499 THEN 1
       WHEN b < 964373 THEN 2 WHEN b < 1028665 THEN 3
       WHEN b < 1044738 THEN 4 WHEN b < 1047952 THEN 5
       ELSE 6 END AS cnt
 FROM (SELECT event_type, rep, v6, {_BOOT_BUCKET_SQL} AS b FROM d) _b),
m AS (SELECT event_type,
  ROUND(CAST(SUM(v6 * cnt) AS DOUBLE)/1000000.0
    /CAST(SUM(cnt) AS DOUBLE), 6) AS mr
 FROM c GROUP BY event_type, rep HAVING SUM(cnt) > 0),
ci AS (SELECT event_type, COUNT(*) AS nrep,
  ROUND(quantile_cont(mr, 0.025), 6) AS ci_lo,
  ROUND(quantile_cont(mr, 0.975), 6) AS ci_hi,
  CAST(SUM(CAST(mr AS DECIMAL(18,6))) AS DOUBLE) AS s,
  CAST(SUM(CAST(mr AS DECIMAL(18,6)) * CAST(mr AS DECIMAL(18,6)))
    AS DOUBLE) AS ss
 FROM m GROUP BY 1),
pt AS (SELECT event_type, COUNT(*) AS n_events,
  ROUND(CAST(SUM(v6) AS DOUBLE)/1000000.0
    /CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
 FROM ev GROUP BY 1)
SELECT pt.event_type, pt.n_events, pt.mean_value,
  ROUND(SQRT(GREATEST((ss - s*s/CAST(nrep AS DOUBLE))
    /(CAST(nrep AS DOUBLE) - 1.0), 0.0)), 6) AS boot_se,
  ci_lo, ci_hi
FROM pt JOIN ci USING (event_type)
ORDER BY pt.event_type
"""
