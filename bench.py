"""Benchmark harness — the driver runs this per-round.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

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
    "dedup_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_pairs",
    "dedup_semantic_pairs",
    "dedup_clusters",
    "sim_topk_bruteforce",
    "sim_ann_ivf",
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

    # min-of-3 timed runs per query: single runs vary ±30% under GC /
    # scheduler noise at these (sub-second .. few-second) durations;
    # the min is the standard steady-state estimator and the DuckDB
    # yardstick (tools/bench_duckdb.py) uses the identical protocol.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            release_persisted()
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
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
                "queries": slowest,
                "queries_file": "BENCH_DETAIL.json",
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
