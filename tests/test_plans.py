"""Physical-plan audits: the properties that make these queries viable
at 100 TB, pinned so they cannot regress.

- filters reach the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema lists only needed columns)
- dimension joins broadcast (no shuffle of the fact table)
- aggregations are partial (map-side combine before the exchange)
- top-k is TakeOrderedAndProject (per-partition heap, no global sort)
- no operator ever degenerates into a CartesianProduct
"""

from __future__ import annotations

import pytest

from nashville_etl_service_backup_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_q01_scan_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    # pruning: untouched columns never leave the parquet reader
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan
    assert "partial_sum" in plan  # map-side combine


def test_q03_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q03_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed
    assert "CartesianProduct" not in plan


def test_q05_no_cartesian_all_dims_broadcast(spark):
    plan = plan_of(spark, "q05_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q06_conjunctive_pushdown(spark):
    plan = plan_of(spark, "q06_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.03)" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_topk_is_take_ordered(spark):
    plan = plan_of(spark, "sim_topk_bruteforce")
    assert "TakeOrderedAndProject" in plan
    for name in ("q03_shipping_priority", "q10_returned_items"):
        assert "TakeOrderedAndProject" in plan_of(spark, name)


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in plan_of(spark, "q_semi_join_urgent")
    assert "LeftAnti" in plan_of(spark, "q_anti_join_inactive")


def test_dedup_joins_are_equi_joins(spark):
    # candidate generation must be hash-joinable — a cross product here
    # is the difference between viable and unrunnable at scale
    for name in ("dedup_lsh_pairs", "dedup_ngram_jaccard", "dedup_simhash_pairs",
                 "dedup_embedding_pairs"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_etl_pipeline_single_pass(spark):
    plan = plan_of(spark, "q_etl_pipeline")
    assert "CartesianProduct" not in plan
    # dispatch is a when-cascade projection, not a filter-per-branch
    # union (which would re-scan the raw zone once per source)
    assert "Union" not in plan
    assert "InMemoryTableScan" not in plan
    # dedup = ONE exchange keyed on url (SortAggregate within partitions
    # afterwards is fine — it streams; a global sort would not be)
    assert "hashpartitioning(url" in plan
    assert "rangepartitioning" not in plan


def test_serving_filters_prune_scan(spark):
    plan = plan_of(spark, "q_count_purchases")
    assert "EqualTo(event_type,purchase)" in plan
    assert "GreaterThan(value,50.0)" in plan
