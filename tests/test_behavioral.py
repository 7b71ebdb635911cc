"""Behavioral analytics wave: funnel ordering invariants, cohort
retention bounds, histogram mass conservation, moment-aggregate
consistency. Oracle hash-matching is covered by the driver gate /
tools/check_correctness.py; these tests pin the semantics."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from nashville_etl_service_backup_spark.queries.behavioral import (
    FUNNEL_STAGES,
    q_cohort_retention,
    q_funnel,
    q_stats_agg,
    q_value_histogram,
)
from nashville_etl_service_backup_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_funnel_monotonic_and_ordered(spark):
    rows = {r.stage_idx: r for r in q_funnel(spark, SF).collect()}
    assert [rows[i].stage for i in sorted(rows)] == list(FUNNEL_STAGES)
    counts = [rows[i].n_users for i in sorted(rows)]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rows[1].pct_of_top == 1.0
    # stage 1 = users with ≥1 signup event
    ev = load(spark, SF, "events")
    n_signup = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert counts[0] == n_signup


def test_funnel_respects_event_order(spark):
    # cross-check stage 2 against an independent window-based
    # computation: users with a view strictly after their first signup
    ev = load(spark, SF, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    expect = (
        ev.filter(F.col("event_type") == "view")
        .join(first_signup, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .select("user_id")
        .distinct()
        .count()
    )
    got = {r.stage: r.n_users for r in q_funnel(spark, SF).collect()}
    assert got["view"] == expect


def test_cohort_retention_bounds(spark):
    out = q_cohort_retention(spark, SF).collect()
    assert out
    by_cohort: dict[str, dict[int, object]] = {}
    for r in out:
        by_cohort.setdefault(r.cohort_day, {})[r.week_offset] = r
    for day, offsets in by_cohort.items():
        assert 0 in offsets, day  # first-day activity guarantees offset 0
        size = offsets[0].n_active
        assert offsets[0].retention == 1.0
        for r in offsets.values():
            assert 0 < r.n_active <= size
            assert 0.0 < r.retention <= 1.0


def test_histogram_mass_and_bounds(spark):
    out = q_value_histogram(spark, SF).collect()
    total = load(spark, SF, "events").count()
    assert sum(r.n for r in out) == total
    for r in out:
        assert 0 <= r.bucket <= 19
        assert r.bucket_lo == r.bucket * 25.0
        assert r.n > 0


def test_stats_agg_consistency(spark):
    for r in q_stats_agg(spark, SF).collect():
        # var == stddev² (up to the independent roundings)
        assert math.isclose(
            r.var_qty, r.std_qty**2, rel_tol=1e-4
        ), (r.l_returnflag, r.l_linestatus)
        assert -1.0 <= r.corr_qty_price <= 1.0
        assert r.std_price > 0
        assert r.n > 0


def test_time_to_convert_counts_cross_check(spark):
    """Converter counts per cohort match an independent first-event
    computation; delays are positive by construction."""
    from nashville_etl_service_backup_spark.queries.behavioral import (
        q_time_to_convert,
    )

    ev = load(spark, SF, "events")
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    p0 = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    expect = (
        s0.join(p0, "user_id")
        .filter(F.col("p") > F.col("s"))
        .groupBy((F.col("user_id") % 4).alias("cohort"))
        .count()
        .collect()
    )
    expect = {r["cohort"]: r["count"] for r in expect}
    got = {r["cohort"]: r for r in q_time_to_convert(spark, SF).collect()}
    assert {k: v["n_converters"] for k, v in got.items()} == expect
    assert all(r["p25_sec"] <= r["p50_sec"] <= r["p90_sec"]
               for r in got.values())
    assert all(r["p25_sec"] > 0 for r in got.values())


def test_survival_km_invariants(spark):
    """Risk set telescopes, survival equals the running product of
    (1 - hazard) within rounding, and is monotone nonincreasing."""
    from nashville_etl_service_backup_spark.queries.behavioral import (
        q_survival_km,
    )

    rows = q_survival_km(spark, "/root/testdata/sf0.001").orderBy(
        "days_to_convert"
    ).collect()
    assert rows, "empty survival table"
    n0 = rows[0]["n_at_risk"]
    assert n0 == sum(r["n_converted"] + r["n_censored"] for r in rows)
    prod, prev_s, at_risk = 1.0, 1.0, n0
    for r in rows:
        assert r["n_at_risk"] == at_risk
        at_risk -= r["n_converted"] + r["n_censored"]
        assert abs(r["hazard"] - r["n_converted"] / r["n_at_risk"]) < 1e-5
        prod *= 1.0 - r["n_converted"] / r["n_at_risk"]
        assert abs(r["survival"] - prod) < 1e-4
        assert r["survival"] <= prev_s + 1e-9
        prev_s = r["survival"]


def test_k_anonymity_toy(spark):
    from nashville_etl_service_backup_spark.operators.profile import (
        k_anonymity,
    )

    rows = (
        [("us", "a", "x")] * 5          # group of 5, single sensitive
        + [("us", "b", "x"), ("us", "b", "y")]  # group of 2, l=2
        + [("de", "a", "x")]            # singleton, l=1
    )
    df = spark.createDataFrame(rows, "nat string, seg string, s string")
    out = k_anonymity(df, ["nat", "seg"], "s", k=3).collect()[0]
    assert out["n_rows"] == 8 and out["n_groups"] == 3
    assert out["k_anon"] == 1          # the singleton
    assert out["rows_lt_k"] == 3       # the 2-group + the singleton
    assert out["l_div_min"] == 1
    assert out["rows_l1"] == 6         # 5-group + singleton


def test_rfm_scores_and_rules(spark):
    from nashville_etl_service_backup_spark.queries.behavioral import (
        q_rfm_segments,
    )

    rows = q_rfm_segments(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        if r["segment"] == "champions":
            assert (
                r["r_score"] >= 4 and r["f_score"] >= 4 and r["m_score"] >= 4
            )
        if r["segment"] == "hibernating":
            assert r["r_score"] <= 2 and r["f_score"] <= 2


def test_attribution_models_conserve_value(spark):
    """Every purchase with >=1 touch distributes exactly its value in
    each model, so the three per-type totals must agree globally."""
    from nashville_etl_service_backup_spark.queries.behavioral import (
        q_attribution,
    )

    rows = q_attribution(spark, "/root/testdata/sf0.001").collect()
    assert rows
    lin = sum(r["linear_value"] for r in rows)
    ft = sum(r["first_touch_value"] for r in rows)
    lt = sum(r["last_touch_value"] for r in rows)
    # linear credits are per-touch rounded; allow cent-level slack
    assert abs(lin - ft) < max(0.01 * len(rows) * 100, 5.0)
    assert abs(ft - lt) < 1e-6


def test_neyman_allocation_favors_variable_strata(spark):
    from nashville_etl_service_backup_spark.queries.llmdata import (
        text_neyman_sample,
    )

    rows = text_neyman_sample(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_drawn"] == min(r["neyman_n"], r["n_h"])
        assert r["neyman_n"] <= 100 and r["proportional_n"] <= 100


def test_bootstrap_ci_brackets_sample_mean(spark):
    from nashville_etl_service_backup_spark.queries.behavioral import (
        q_bootstrap_ci,
    )

    rows = q_bootstrap_ci(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # 40 Poisson replicates center on the sample mean: the 2.5/97.5
        # percentile band must bracket it, and the width is positive
        assert r.ci_lo <= r.mean_value <= r.ci_hi
        assert r.ci_lo < r.ci_hi
        assert r.boot_se > 0.0
        assert r.n_events > 0


def test_bootstrap_ci_partition_invariant(spark):
    from nashville_etl_service_backup_spark.operators.sketch import (
        poisson_bootstrap_ci,
    )
    from nashville_etl_service_backup_spark.tables import load

    ev = load(spark, SF, "events")
    base = poisson_bootstrap_ci(
        ev, "event_id", "event_type", "value", reps=40
    ).collect()
    # same computation over a 13-partition shuffle of the input: the
    # md5 draws and exact decimal sums must reproduce every column
    again = poisson_bootstrap_ci(
        ev.repartition(13), "event_id", "event_type", "value", reps=40
    ).collect()
    assert base == again


def test_poisson_replica_counts_mean_one(spark):
    from nashville_etl_service_backup_spark.operators.sketch import (
        poisson_replica_count,
    )

    # across many (key, rep) draws the Poisson(1) counts average ~1
    # and never exceed the cap of 6
    df = spark.range(2000).select(
        poisson_replica_count(F.col("id"), F.lit(0)).alias("c")
    )
    stats = df.agg(
        F.avg("c").alias("m"), F.max("c").alias("mx"), F.min("c").alias("mn")
    ).first()
    assert 0.9 < stats.m < 1.1
    assert 0 <= stats.mn and stats.mx <= 6
