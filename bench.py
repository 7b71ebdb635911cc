"""Benchmark harness — the driver runs this per-round.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

DRIFT-PROOF PAIR (round 8, VERDICT r7 #1): the DuckDB yardstick runs
INTERLEAVED with Spark in this same process — per query, the timed
runs alternate spark, duckdb, spark, duckdb, … so both engines see the
same machine window and the per-query spark/duckdb RATIO is immune to
the window-to-window drift that forced per-claim adjudications in
rounds 5–7. The stdout line carries `duckdb_value` and `ratio`
(spark/duckdb over oracle-covered queries); BENCH_DETAIL.json carries
the full per-query pair + ratio. Set SPARK_GRAFT_BENCH_NO_TWIN=1 for a
Spark-only run (old behavior); tools/bench_duckdb.py remains for a
standalone DuckDB pass.

Per-engine run counts adapt to the query's own duration so the pair
stays ~bounded in wall time: first timed run < 15 s → min-of-3,
< 45 s → min-of-2, else min-of-1 (the slow queries are the multi-ten-
second DuckDB twins where drift is irrelevant relative to magnitude;
every Spark query at sf0.1 is < 15 s so Spark keeps min-of-3
everywhere — the protocol rounds 2–7 used).

Materialization uses the noop sink (df.write.format("noop")) so every
column is computed JVM-side without driver collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nashville_etl_service_backup_spark import queries as _q
from nashville_etl_service_backup_spark.operators import release_persisted
from nashville_etl_service_backup_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q13_order_count_distribution",
    "q18_large_orders",
    "q21_waiting_supplier",
    "q_running_total",
    "q_customer_order_stats",
    "q_lag_lead",
    "q_percentiles",
    "q_doc_search_rank",
    "q_doc_search_scan",
    "q_tumbling_window",
    "q_session_window",
    "q_events_pivot",
    "q_asof_join",
    "q_range_join",
    "q_etl_pipeline",
    "q_etl_from_bronze",  # same pipeline post-parse: the standing
    # number that makes q_etl_pipeline's JSON-parse floor measurable
    "dedup_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_pairs",
    "dedup_semantic_pairs",
    "dedup_clusters",
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "sim_ann_ivf_incremental",  # streamed index, same oracle as the batch
    "text_token_counts",
    "text_bm25_topk",
    "text_split_counts",
    "text_zscore_by_lang",
    "doc_fingerprints",
    "text_pii_scrub",
    "text_repetition",
    "text_contamination",
    "text_filter_funnel",
    "text_lm_quality",
    "text_boilerplate_strip",
    "text_length_histogram",
    "llm_corpus_curation",
    "text_pack_bins",
    "q_cms_user_counts",
    "sim_ann_pq",
    "q_approx_distinct",
    "q_approx_percentiles",
    "text_domain_cap",
    "text_bpe_merges",
    "text_bpe_encode",
    "text_dup_spans",
    "text_alpha_mixture",
    "text_dsir_sample",
    "text_quality_classifier",
    "text_quality_tree",
    "text_classifier_cv",
    "text_quality_gbm",
    "text_snapshot_delta",
    "hybrid_search_rrf",
    "text_html_extract",
    "text_url_normalize",
    "llm_tokenize_pack",
    "sim_ann_jl",
    "multimodal_image_features",
    "q_grouping_sets",
    "q_skew_salted_join",
    "q_ring_centroid",
    "q_funnel",
    "q_cohort_retention",
    "q_scd2_customers",
    "q_bloom_prune_join",
    "q_profile_events",
    "q_fuzzy_match_parts",
    "q_pagerank_suppliers",
    "q_mad_outliers",
    "q_markov_transitions",
    "text_tfidf_keywords",
    "q_triangle_count",
    "q_hll_setops",
    "q_skew_report",
    "q_chi_square",
    "q_ewma_smoothing",
    "q_rolling_distinct",
    "q_time_to_convert",
    "q_late_data_audit",
    "q_scd2_asof_lookup",
    "q_market_basket",
    "q_label_centroid_sim",
    "q_cdc_apply",
    "q_referential_audit",
    "q_session_paths",
    "q_ab_test",
    "q_winsorize",
    "dedup_degree_dist",
    "text_mixture_drift",
    "q_abc_analysis",
    "q_seasonality_dow",
    "q_discovery_curve",
    "q_psi_drift",
    "text_weighted_sample",
    "q_zorder_layout",
    "dedup_prefix_jaccard",
    "q_golden_record",
    "q_encoding_audit",
    "multimodal_phash_neardup",
    "q_grouped_topk",
    "q_rank_variants",
    "dedup_recall_audit",
    "text_nb_lang",
    "text_conformal_gate",
    "sim_cluster_silhouette",
    "text_calibration_curve",
    "text_neyman_sample",
    "q_survival_km",
    "q_rfm_segments",
    "q_attribution",
    "q_ols_revenue",
    "q_cusum_shift",
    "q_bfs_hops",
    "q_k_anonymity",
    "text_lift_gains",
    "q_bootstrap_ci",
    "sim_pca_power",
    "sim_quantize_recall",
    "text_bigram_lm",
    "q_compaction_plan",
    "sim_sparse_cosine",
    "sim_mmr_diverse",
    "q_forget_cascade",
    "sim_ann_ndcg",
    "q_dp_release",
    "text_feature_woe",
    "text_score_drift",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# adaptive run-count rule, applied to BOTH engines symmetrically: the
# min-of-N estimator needs N>1 only where fixed-overhead jitter is
# comparable to the measurement
def _n_runs(first: float) -> int:
    if first < 15.0:
        return 3
    if first < 45.0:
        return 2
    return 1


def _duck_connect(sf_dir: str):
    """DuckDB twin connection over the same parquet files, same thread
    count as Spark's local[N]."""
    import duckdb

    from nashville_etl_service_backup_spark.tables import TABLES

    threads = os.environ.get("SPARK_GRAFT_CPUS", "32")
    con = duckdb.connect()
    con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _q.extended_queries()

    # Warmup: run every headline query once at the smoke SF (sf0.001 —
    # different files, 100× less data) so measured runs don't pay
    # one-time JVM class-loading, whole-stage-codegen JIT, or Python
    # worker pool spin-up. Standard steady-state benchmarking; no
    # measured data is cached (clearCache between phases).
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    # 3 passes: one is not enough to reach steady state — the HOF-heavy
    # dedup plans run interpreted expression paths that the JVM only
    # JITs after thousands of invocations (measured: pass 1→3 drops
    # lsh_pairs 5.4s→2.5s at sf0.1).
    for _ in range(3):
        for name in HEADLINE:
            try:
                materialize(qs[name](spark, warm_dir))
            except Exception:
                pass
        release_persisted()
        spark.catalog.clearCache()
    # One untimed pass at the measured SF — same protocol as the DuckDB
    # yardstick (tools/bench_duckdb.py: "warm run after one untimed
    # pass"). Some JIT/spill paths only trigger at the measured data
    # size, so sf0.001 warmup alone under-warms; no data is cached.
    for name in HEADLINE:
        try:
            materialize(qs[name](spark, sf_dir))
        except Exception:
            pass
    release_persisted()
    spark.catalog.clearCache()

    # DuckDB twin setup (no separate warm pass: the parquet pages are
    # hot from Spark's untimed full pass over the same files, DuckDB's
    # plan compile is sub-ms, and min-of-N discounts the first run's
    # residual cold cost for every query where jitter matters)
    twin = os.environ.get("SPARK_GRAFT_BENCH_NO_TWIN", "") != "1"
    con = _duck_connect(sf_dir) if twin else None
    oracles = _q.extended_oracles() if twin else {}

    # timed phase: per query, the runs alternate spark, duckdb, spark,
    # duckdb, … inside ONE window; min per engine
    timings: dict[str, float] = {}
    duck: dict[str, float | None] = {}
    ratio: dict[str, float | None] = {}
    runs_used: dict[str, dict[str, int]] = {}
    for name in HEADLINE:
        fn = qs[name]
        sql = oracles.get(name) if twin else None

        def spark_once() -> float:
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            release_persisted()
            spark.catalog.clearCache()
            return dt

        def duck_once() -> float:
            # settle before the twin's timed window: the preceding
            # Spark run leaves the JVM with collectable shuffle/codegen
            # garbage whose concurrent collection steals memory
            # bandwidth from DuckDB's allocation-heavy list kernels
            # (A/B measured ~10-20% twin inflation without this; the
            # residual co-residence gap is bounded each round by the
            # standalone control in BENCH_ISOLATIONS_r08/README.md)
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.05)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            return time.perf_counter() - t0

        s_times = [spark_once()]
        d_times = [duck_once()] if sql is not None else []
        s_total = _n_runs(s_times[0])
        d_total = _n_runs(d_times[0]) if d_times else 0
        for i in range(1, 3):
            if i < s_total:
                s_times.append(spark_once())
            if i < d_total:
                d_times.append(duck_once())
        timings[name] = round(min(s_times), 3)
        # keep enough digits that a sub-millisecond twin never rounds
        # to 0.0 — `is not None` (not truthiness) decides presence, so
        # a measured-but-tiny twin still participates in totals/ratio
        # (round-8 ADVICE)
        duck[name] = round(min(d_times), 6) if d_times else None
        ratio[name] = (
            round(timings[name] / duck[name], 3)
            if duck[name] is not None and duck[name] > 0
            else None
        )
        runs_used[name] = {"spark": len(s_times), "duckdb": len(d_times)}

    total = round(sum(timings.values()), 3)
    paired = [n for n in HEADLINE if duck.get(n) is not None]
    duck_total = round(sum(duck[n] for n in paired), 6) if paired else None
    pair_ratio = (
        round(sum(timings[n] for n in paired) / duck_total, 3)
        if duck_total is not None and duck_total > 0
        else None
    )
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver captures only the TAIL of stdout (~2 KB in round 4,
    # which truncated the 131-query JSON line from the front and left
    # "parsed": null). Full per-query detail goes to a side file; the
    # stdout line carries the headline totals plus only the slowest
    # queries so the whole object fits the capture window.
    detail = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "duckdb": duck,
        "ratio": ratio,
        "runs": runs_used,
        "duckdb_value": duck_total,
        "pair_ratio": pair_ratio,
        "protocol": "interleaved-per-query same-window pair, adaptive min-of-N",
        "sf": sf_val,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
        "w",
    ) as f:
        json.dump(detail, f, separators=(",", ":"))
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:25]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "duckdb_value": duck_total,
                "pair_ratio": pair_ratio,
                "queries": slowest,
                "queries_file": "BENCH_DETAIL.json",
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
