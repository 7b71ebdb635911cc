"""Analytics wave: sketch accuracy/merge invariants (HLL, histogram
quantiles, CMS — all oracle-checked since round 3) and audio feature
plumbing invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from nashville_etl_service_backup_spark.queries.analytics import (
    q_approx_distinct,
)
from nashville_etl_service_backup_spark.queries.llmdata import (
    multimodal_audio_features,
)
from nashville_etl_service_backup_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_error_bound(spark):
    # sf0.01, not sf0.001: the raw HLL estimate (deliberately without
    # the ln()-based small-range correction — see operators/sketch.py)
    # is only meaningful for n ≳ 2.5·m = 640 distinct keys
    rows = q_approx_distinct(spark, "/root/testdata/sf0.01").collect()
    for r in rows:
        # m=256 → ~6.5% standard error; 20% catches wiring bugs while
        # tolerating an unlucky register draw on this fixed dataset
        e = r.exact_parts
        assert abs(r.hll_distinct - e) / e < 0.20, (r.l_returnflag, r.hll_distinct, e)


def test_hll_merge_is_union_sketch(spark):
    from nashville_etl_service_backup_spark.operators.sketch import (
        hll_merge,
        hll_registers,
    )

    li = load(spark, SF, "lineitem")
    whole = hll_registers(li, "l_partkey", ["l_returnflag"])
    half_a = hll_registers(li.filter(F.col("l_orderkey") % 2 == 0), "l_partkey", ["l_returnflag"])
    half_b = hll_registers(li.filter(F.col("l_orderkey") % 2 == 1), "l_partkey", ["l_returnflag"])
    merged = hll_merge(half_a, half_b)
    key = lambda r: (r.l_returnflag, r.bucket)
    assert {key(r): r.register for r in whole.collect()} == {
        key(r): r.register for r in merged.collect()
    }


def test_audio_features_exact_semantics(spark):
    import hashlib

    out = multimodal_audio_features(spark, SF)
    rows = {r.media_id: r for r in out.collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, SF, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .collect()
    }
    assert rows.keys() == docs.keys()
    mid = next(iter(rows))
    b = docs[mid].encode()
    dig = hashlib.md5(b).digest()
    r = rows[mid]
    assert r.n_bytes == len(b)
    assert r.sample_rate == 16000
    assert r.duration_sec == len(b) / 16000.0
    assert (r.rms_lo, r.rms_hi) == (dig[2] / 255.0, dig[3] / 255.0)


def test_approx_percentiles_close_to_exact(spark):
    from nashville_etl_service_backup_spark.queries.analytics import (
        q_approx_percentiles,
        q_percentiles,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["o_orderpriority"]: r for r in q_percentiles(spark, sf).collect()}
    approx = {
        r["o_orderpriority"]: r for r in q_approx_percentiles(spark, sf).collect()
    }
    from nashville_etl_service_backup_spark.operators.sketch import HIST_NBINS

    stats = (
        load(spark, sf, "orders")
        .agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
        .collect()[0]
    )
    bin_w = (stats.mx - stats.mn) / HIST_NBINS
    assert set(exact) == set(approx)
    for k in exact:
        for e_col, a_col in [("p25", "hq25"), ("p50", "hq50"), ("p95", "hq95")]:
            e, a = exact[k][e_col], approx[k][a_col]
            # the equi-width sketch guarantees resolution of one bin
            # width (plus the t=q·n vs rank-interpolation definition
            # skew, sub-bin at these counts)
            assert abs(a - e) <= 1.5 * bin_w, (k, e_col, e, a, bin_w)


def test_cms_overcount_invariant_and_merge(spark):
    """CMS point estimates never undercount, and merging per-half
    sketches reproduces the whole-corpus counter table exactly (counters
    are a commutative monoid)."""
    from pyspark.sql import functions as F

    from nashville_etl_service_backup_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from nashville_etl_service_backup_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    cms = cms_build(ev, "user_id", depth=4, width=512)
    keys = ev.select("user_id").distinct().limit(50)
    est = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(cms, keys, "user_id", depth=4, width=512).collect()
    }
    true = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est, "no estimates produced"
    for uid, e in est.items():
        assert e >= true[uid], (uid, e, true[uid])

    half_a = cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    half_b = cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in cms_merge(half_a, half_b).collect()
    }
    whole = {
        (r["row_idx"], r["bucket"]): r["cnt"] for r in cms.collect()
    }
    assert merged == whole


def test_bloom_filter_no_false_negatives_and_merge(spark):
    """Every inserted key passes (no false negatives — the bloom
    guarantee); merging per-slice filters equals the filter of the
    union (OR-monoid)."""
    from nashville_etl_service_backup_spark.operators.sketch import (
        bloom_bitstring,
        bloom_build,
        bloom_merge,
        bloom_might_contain,
    )
    from pyspark.sql import functions as F

    a = spark.range(0, 40).withColumnRenamed("id", "k")
    b = spark.range(40, 80).withColumnRenamed("id", "k")
    merged = bloom_merge(bloom_build(a, "k"), bloom_build(b, "k"))
    whole = bloom_build(a.unionByName(b), "k")
    assert {r["pos"] for r in merged.collect()} == {
        r["pos"] for r in whole.collect()
    }
    bits = bloom_bitstring(whole)
    hits = (
        a.unionByName(b)
        .select(bloom_might_contain(bits, F.col("k")).alias("ok"))
        .collect()
    )
    assert all(r["ok"] for r in hits)


def test_profile_operator(spark):
    """Completeness counts nulls; min/max are NUMERIC (not
    lexicographic) for numeric columns; one row per profiled column."""
    from nashville_etl_service_backup_spark.operators.profile import profile
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(100.0, "a"), (9.0, "b"), (None, "b"), (23.5, None)],
        "v double, s string",
    )
    out = {r["column"]: r for r in profile(df, ["v", "s"]).collect()}
    assert out["v"]["n_rows"] == 4 and out["v"]["n_null"] == 1
    assert out["v"]["completeness"] == 0.75
    assert out["v"]["n_distinct"] == 3
    # numeric min/max: 9 < 100 numerically though '100...' < '9...'
    assert out["v"]["min_val"] == "9.000000"
    assert out["v"]["max_val"] == "100.000000"
    assert out["s"]["min_val"] == "a" and out["s"]["max_val"] == "b"


def test_pagerank_star_graph(spark):
    """On a bidirected star (hub 0 ↔ leaves 1..4) the hub accumulates
    the most rank and total mass is conserved (≈1)."""
    from nashville_etl_service_backup_spark.operators.graph import pagerank

    leaves = list(range(1, 5))
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in leaves] + [(f"l{i}", "h") for i in leaves],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, 5, 5).collect()}
    assert ranks["h"] == max(ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert len({ranks[f"l{i}"] for i in leaves}) == 1  # symmetry


def test_mad_outliers_flags_planted_spike(spark):
    """A planted extreme point is flagged; the tight cluster is not —
    and the spike does NOT inflate the threshold (robustness)."""
    from nashville_etl_service_backup_spark.operators.profile import (
        mad_outliers,
    )

    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    row = mad_outliers(df, "value", ["grp"]).collect()[0]
    assert row["n"] == 8
    assert row["n_outliers"] == 1  # only the 1000.0 spike
    assert abs(row["median"] - 10.05) < 1e-9


def test_triangle_list_counts_k4(spark):
    """K4 has exactly 4 triangles; a path graph has none; orientation
    and duplicate edges don't change the answer."""
    from nashville_etl_service_backup_spark.operators.graph import (
        triangle_list,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]  # both dirs
    df = spark.createDataFrame(k4, "src long, dst long")
    tris = triangle_list(df).collect()
    assert len(tris) == 4
    assert all(r["a"] < r["b"] < r["c"] for r in tris)
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    assert triangle_list(path).count() == 0


def test_skew_report_and_chi_square(spark):
    """Skew ratio reflects the planted heavy key; chi-square is ~0 for
    an exactly independent contingency table."""
    from nashville_etl_service_backup_spark.operators.profile import (
        chi_square,
        skew_report,
    )

    rows = [(1,)] * 8 + [(2,), (3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    r = skew_report(df, "k").collect()[0]
    assert r["n_keys"] == 5 and r["total_rows"] == 12
    assert r["max_rows"] == 8 and r["top_key"] == "1"
    assert abs(r["skew_ratio"] - 8 / 2.4) < 1e-6

    # perfectly independent 2×2: chi2 exactly 0
    ind = spark.createDataFrame(
        [("a", 0)] * 2 + [("a", 1)] * 2 + [("b", 0)] * 3 + [("b", 1)] * 3,
        "x string, y long",
    )
    c = chi_square(ind, "x", "y").collect()[0]
    assert c["total_rows"] == 10 and c["dof"] == 1
    assert abs(c["chi2"]) < 1e-9


def test_rolling_distinct_window_semantics(spark):
    """The 7-day register-window estimate equals the estimate built
    directly from the union of the 7 days' raw keys (monoid property
    under the sliding merge), and exact_7d is non-decreasing vs the
    per-day distinct."""
    from nashville_etl_service_backup_spark.queries.analytics import (
        q_rolling_distinct,
    )
    from nashville_etl_service_backup_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from nashville_etl_service_backup_spark.tables import load
    import pyspark.sql.functions as F

    SF = "/root/testdata/sf0.001"
    out = {r["day"]: r for r in q_rolling_distinct(spark, SF).collect()}
    ev = load(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    some_day = sorted(out)[len(out) // 2]
    window_keys = ev.filter(
        (F.col("day") <= F.lit(some_day))
        & (F.col("day") >= F.date_sub(F.lit(some_day), 6))
    )
    direct = hll_estimate(
        hll_registers(window_keys, "user_id", []), []
    ).collect()[0]["hll_distinct"]
    assert out[some_day]["hll_7d"] == direct
    exact = window_keys.select("user_id").distinct().count()
    assert out[some_day]["exact_7d"] == exact


def test_profile_all_null_and_timestamp_columns(spark):
    """An all-null column reports 0 completeness with NULL min/max; a
    timestamp column stringifies at micros precision."""
    import datetime

    from nashville_etl_service_backup_spark.operators.profile import profile

    ts = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    df = spark.createDataFrame(
        [(ts, None), (ts, None)], "t timestamp, gone string"
    )
    out = {r["column"]: r for r in profile(df, ["t", "gone"]).collect()}
    assert out["gone"]["completeness"] == 0.0
    assert out["gone"]["n_null"] == 2
    assert out["gone"]["min_val"] is None
    assert out["t"]["min_val"] == "2024-01-02 03:04:05.123456"
    assert out["t"]["n_distinct"] == 1


def test_skew_report_uniform_keys(spark):
    """Perfectly uniform keys report skew_ratio exactly 1."""
    from nashville_etl_service_backup_spark.operators.profile import (
        skew_report,
    )

    df = spark.createDataFrame(
        [(k,) for k in range(10) for _ in range(3)], "k long"
    )
    r = skew_report(df, "k").collect()[0]
    assert r["skew_ratio"] == 1.0 and r["max_rows"] == 3


def test_cusum_prefix_form_equals_direct_recursion(spark):
    """The window formulation S_t = P_t - min(0, min prefix P) must
    equal the textbook recursion S_t = max(0, S_{t-1} + d_t) replayed
    in Python over the same deviations."""
    from nashville_etl_service_backup_spark.queries.analytics import (
        q_cusum_shift,
    )

    rows = q_cusum_shift(spark, SF).orderBy("day").collect()
    assert len(rows) > 5
    # recover the deviations from consecutive prefix sums is lossy;
    # instead recompute d_t from the published daily means + the
    # reference stats implied by the first week's rows
    import decimal

    ref = [r["daily_mean"] for r in rows if r["day"] <= "2024-01-07"]
    rd = float(len(ref))
    rs = float(sum(decimal.Decimal(f"{m:.6f}") for m in ref))
    rss = float(
        sum(decimal.Decimal(f"{round(m * m, 12):.12f}") for m in ref)
    )
    mu0 = round(rs / rd, 6)
    import math

    sg = round(math.sqrt(max((rss - rs * rs / rd) / rd, 0.0)), 6)
    s_up = s_dn = 0.0
    for r in rows:
        du = round((r["daily_mean"] - mu0) / sg - 0.5, 6)
        dd = round((mu0 - r["daily_mean"]) / sg - 0.5, 6)
        s_up = max(0.0, s_up + du)
        s_dn = max(0.0, s_dn + dd)
        assert abs(r["cusum_up"] - s_up) < 1e-6, r["day"]
        assert abs(r["cusum_down"] - s_dn) < 1e-6, r["day"]
        assert r["alarm"] == (1 if (r["cusum_up"] > 4.0 or r["cusum_down"] > 4.0) else 0)


def test_bfs_hops_path_graph_and_unreachable(spark):
    from nashville_etl_service_backup_spark.operators.graph import bfs_hops

    # undirected path 0-1-2-3 plus an isolated edge 8-9
    und = [(0, 1), (1, 2), (2, 3), (8, 9)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_hops(edges, seeds, 6).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 8,9 unreachable -> absent
    # round-limited: 2 rounds cannot reach node 3
    got2 = {r["node"]: r["dist"] for r in bfs_hops(edges, seeds, 2).collect()}
    assert got2 == {0: 0, 1: 1, 2: 2}


def test_forget_cascade_retraction_semantics(spark):
    """User 1 is tombstoned: raw loses its 3 rows; the user rollup
    loses exactly one key; day d1 (mixed) survives with retracted mass
    while day d2 (only user 1) vanishes."""
    import datetime

    from nashville_etl_service_backup_spark.operators.profile import (
        forget_cascade_audit,
    )

    d1 = datetime.datetime(2026, 1, 1, 10, 0)
    d2 = datetime.datetime(2026, 1, 2, 10, 0)
    rows = [
        (1, d1, 10.0), (1, d1, 5.0), (1, d2, 1.0),   # tombstoned
        (2, d1, 7.0), (3, d1, 2.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    tomb = spark.createDataFrame([(1,)], ["user_id"])
    out = {
        r["table"]: (
            r["rows_before"],
            r["rows_after"],
            r["rows_removed"],
            r["value_removed"],
        )
        for r in forget_cascade_audit(ev, tomb).collect()
    }
    assert out["events_raw"] == (5, 2, 3, 16.0)
    assert out["user_rollup"] == (3, 2, 1, 16.0)
    assert out["daily_rollup"] == (2, 1, 1, 16.0)


def test_dp_noisy_counts_deterministic_laplace(spark):
    """Noise is deterministic per (salt, key), zero-mean-ish Laplace
    magnitudes at eps=1 (|noise| = -ln(u') stays within ~15 for 2^20
    buckets), and re-release with the same salt is identical."""
    from nashville_etl_service_backup_spark.operators.profile import (
        dp_noisy_counts,
    )

    rows = [(i, f"t{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    a = {r["grp"]: (r["noise"], r["n_noisy"]) for r in dp_noisy_counts(df, "grp").collect()}
    b = {r["grp"]: (r["noise"], r["n_noisy"]) for r in dp_noisy_counts(df, "grp").collect()}
    assert a == b and len(a) == 4
    for grp, (noise, noisy) in a.items():
        assert abs(noise) < 15.0
        assert noisy != 25 or noise == 0.0  # noise actually applied
    # a different salt re-draws
    c = {r["grp"]: r["noise"] for r in dp_noisy_counts(df, "grp", salt="dp2").collect()}
    assert any(c[g] != a[g][0] for g in c)


def test_q21_single_pass_matches_two_pass_formulation(spark):
    """Round-9 rewrite pin: folding the (unique) late supplier into the
    per-order aggregate must produce the identical waiting counts as
    the old late-lines ⋈ target semi-join + countDistinct tail. The
    old formulation is replayed inline on sf0.001."""
    from nashville_etl_service_backup_spark.queries.tpch2 import (
        q21_waiting_supplier,
    )

    new = [
        (r["s_name"], r["numwait"])
        for r in q21_waiting_supplier(spark, SF).collect()
    ]

    orders = load(spark, SF, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, SF, "lineitem")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    target = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    supp = load(spark, SF, "supplier")
    old = [
        (r["s_name"], r["numwait"])
        for r in (
            lo.filter(late)
            .join(target, F.col("l_orderkey") == F.col("_ok"), "left_semi")
            .groupBy("l_suppkey")
            .agg(F.countDistinct("l_orderkey").alias("numwait"))
            .join(
                F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
            )
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(20)
        ).collect()
    ]
    assert new == old and len(new) > 0
