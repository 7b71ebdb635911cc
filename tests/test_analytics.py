"""Analytics wave: HLL accuracy (its oracle is intentionally rows-only)
and audio feature plumbing invariants."""

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


def test_approx_distinct_within_rsd(spark):
    est = {
        r.l_returnflag: r.approx_parts
        for r in q_approx_distinct(spark, SF).collect()
    }
    li = load(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        # rsd=0.02 → generous 10% bound; catches gross sketch wiring bugs
        assert abs(est[k] - e) / e < 0.10, (k, est[k], e)


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
    assert set(exact) == set(approx)
    for k in exact:
        for e_col, a_col in [("p25", "ap25"), ("p50", "ap50"), ("p95", "ap95")]:
            e, a = exact[k][e_col], approx[k][a_col]
            assert abs(a - e) / e < 0.02, (k, e_col, e, a)


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
