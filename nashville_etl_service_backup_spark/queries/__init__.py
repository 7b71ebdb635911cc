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

Registry layout (round-3, extended round-4): the driver's correctness
gate records the FIRST 50 entries, so the registry is EXACTLY 50
entries — 34 flagship queries individually, plus 16 composite suites
(queries/suites.py) that fold the remaining queries in by operator
family (198 queries in the extended registry).  Every individual
query (suite members included) stays addressable via
``extended_queries()`` / ``extended_oracles()`` for the bench harness,
plan audits, and tools.
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
    suites,
    tpch,
    tpch2,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (llmdata, etl_e2e, serving_q, behavioral, analytics, tpch, tpch2)

# The driver records correctness for the first 50 registry entries — this
# IS the registry (exactly 50, nothing appended after).  Individual
# entries lead; each suite is a string-normalized UNION ALL of the listed
# member queries and hash-checks every member row (see suites.py).
_PRIORITY = [
    # -- LLM-data pipeline: dedup & similarity --
    "dedup_exact_bow",
    "dedup_minhash_sig",
    "dedup_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_pairs",
    "dedup_semantic_pairs",
    "dedup_clusters",
    "dedup_resolve",
    "doc_fingerprints",
    "sim_topk_bruteforce",
    "sim_ann_lsh",  # exact oracle since r3 (float-literal planes); recall also pinned in tests
    "sim_ann_ivf",
    # -- LLM-data pipeline: text analysis --
    "text_bm25_topk",
    "text_token_counts",
    "text_quality_docs",
    "text_lm_quality",
    "text_pii_scrub",
    "text_repetition",
    "text_filter_funnel",
    "text_split_counts",
    "text_mixture_sample",
    "text_zscore_by_lang",
    "text_contamination",
    "text_pack_bins",
    "text_length_histogram",
    "llm_corpus_curation",  # funnel → LSH dedup → resolve → split, end to end
    "text_vocab_suite",  # top_terms + lang_id + quality_by_lang + stratified_sample + boilerplate_strip
    # -- multimodal --
    "multimodal_suite",  # image features + audio features + frame sample
    # -- end-to-end ETL pipeline (the reference's whole job as one query) --
    "q_etl_pipeline",
    # -- serving surface --
    "q_doc_search_rank",
    "q_paginate_events",
    "q_distinct_event_types",
    "q_count_purchases",
    "q_reshape_suite",  # json roundtrip + events pivot + lineitem unpivot
    "q_ring_centroid",
    # -- sketches --
    "q_cms_user_counts",
    "q_approx_suite",  # portable HLL + histogram-quantile sketches (oracle-checked)
    # -- operator-family suites --
    "q_time_windows_suite",  # tumbling + sliding + session + gapfill
    "q_window_funcs_suite",  # lag/lead + range frame + running total + percentiles
    "q_multidim_agg_suite",  # grouping sets + cube + rollup + stats agg
    "q_behavioral_suite",  # funnel + cohort retention + value histogram
    "q_join_family_suite",  # as-of + range + salted + anti + semi + set-ops
    "q_analytics_suite",  # top-per-brand window + customer order stats
    # -- TPC-H plan families --
    "q_tpch_pricing_suite",  # q01 q06 q14 q19
    "q_tpch_shipping_suite",  # q03 q05 q10
    "q_tpch_global_suite",  # q07 q08 q09
    "q_tpch_distribution_suite",  # q04 q12 q13 q22
    "q_tpch_supplier_suite",  # q02 q11 q15 q16 q20
    "q_tpch_bigcustomer_suite",  # q17 q18 q21
]


def _merged() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for mod in _MODULES + (suites,):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    """The driver-facing registry: exactly the 50 _PRIORITY entries."""
    merged, _ = _merged()
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise KeyError(f"_PRIORITY names not in registry: {missing}")
    assert len(_PRIORITY) == 50, len(_PRIORITY)
    return {name: merged[name] for name in _PRIORITY}


def all_oracles() -> dict[str, str]:
    _, oracles = _merged()
    return {n: oracles[n] for n in _PRIORITY if n in oracles}


def extended_queries() -> dict[str, QueryFn]:
    """Every individual query (suite members included) plus the suites —
    for bench, plan audits, and tools."""
    merged, _ = _merged()
    return merged


def extended_oracles() -> dict[str, str]:
    _, oracles = _merged()
    return oracles
