"""Query registry: every implemented operator from SURVEY.md §2 plus the
100-TB-pipeline extensions, each as a (spark, sf_dir) -> DataFrame callable
with a hash-matching DuckDB oracle SQL string.

Determinism contract (how every query is written so the driver's
row-count + schema + order-insensitive value-hash check passes):
- money/double SUMs go through DECIMAL(18,4|6) in BOTH engines — exact,
  summation-order-independent (Spark partial aggregation order varies);
- AVGs are decimal-sum / count, rounded, never native double avg;
- any LIMIT/top-k orders by a total order ending in a unique key;
- timestamps are returned as formatted strings (micros included);
- arrays are never returned (DuckDB list_distinct is unordered) —
  only scalars derived from them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nashville_etl_service_backup_spark.queries import (
    analytics,
    behavioral,
    etl_e2e,
    llmdata,
    serving_q,
    tpch,
    tpch2,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (llmdata, etl_e2e, serving_q, behavioral, analytics, tpch, tpch2)

# Registry order is load-bearing: the driver's correctness gate records the
# first 50 entries in insertion order.  Lead with the flagship LLM-data
# pipeline (dedup / similarity / text / multimodal), the end-to-end ETL
# query, the serving surface, and one query per distinct operator family
# (as-of join, range join, anti join, ...); the redundant TPC-H shape
# variants and the two sketch queries that have no exact oracle come last.
_PRIORITY = [
    # -- LLM-data pipeline (dedup, similarity, text analysis, multimodal) --
    # (dedup_minhash_sig and text_quality_by_lang sit past the window:
    # the former is a building block of dedup_lsh_pairs, the latter an
    # aggregate view of text_quality_docs — pii/repetition are distinct
    # capabilities and take their slots)
    "dedup_exact_bow",
    "dedup_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_pairs",
    "dedup_clusters",
    "dedup_resolve",
    "doc_fingerprints",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "text_bm25_topk",
    "text_token_counts",
    "text_quality_docs",
    "text_pii_scrub",
    "text_repetition",
    # text_lang_id's language-ID expression is exercised verbatim inside
    # the funnel's no_language rule; the funnel composes the full C4/
    # Gopher filter pipeline and takes the slot
    "text_filter_funnel",
    "text_split_counts",
    "text_mixture_sample",
    "text_zscore_by_lang",
    # text_top_terms (vocab stats; token-count family) sits past the
    # window — contamination auditing is the more load-bearing capability
    "text_contamination",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    # -- end-to-end ETL pipeline (the reference's whole job as one query) --
    "q_etl_pipeline",
    # -- serving surface (search, pagination, windows, JSON) --
    "q_doc_search_rank",
    "q_paginate_events",
    "q_distinct_event_types",
    "q_count_purchases",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_resample_gapfill",
    # q_json_roundtrip's F22 coverage is already in-window via
    # q_etl_pipeline's to_json/from_json pass; packing takes its slot
    "text_pack_bins",
    "q_events_pivot",
    # -- behavioral analytics --
    "q_funnel",
    "q_cohort_retention",
    "q_value_histogram",
    "q_stats_agg",
    # -- one query per distinct operator family --
    "q_lag_lead",
    "q_grouping_sets",
    "q_skew_salted_join",
    "q_ring_centroid",
    "q_range_frame",
    "q_unpivot_lineitem",
    "q_percentiles",
    "q_cube_returns",
    "q_asof_join",
    "q_range_join",
    "q_anti_join_inactive",
]


def _ordered(per_module: dict[str, dict]) -> dict:
    merged: dict = {}
    for mod_map in per_module.values():
        merged.update(mod_map)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise KeyError(f"_PRIORITY names not in registry: {missing}")
    out = {name: merged[name] for name in _PRIORITY}
    out.update((n, f) for n, f in merged.items() if n not in out)
    return out


def all_queries() -> dict[str, QueryFn]:
    return _ordered({m.__name__: m.QUERIES for m in _MODULES})


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    out = {n: merged[n] for n in _PRIORITY if n in merged}
    out.update((n, s) for n, s in merged.items() if n not in out)
    return out
