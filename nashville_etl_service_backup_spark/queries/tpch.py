"""Relational/BENCH layer queries over the TPC-H-ish star schema —
exercising the operator classes the reference lacks but the target engine
must have (SURVEY §2.4/2.5/2.6/2.9 gaps): hash/broadcast joins, grouped
and distinct aggregation, rollup, window functions, semi/anti joins,
top-k.

Scale notes per query are in the docstrings; the common themes:
- dimension joins (region/nation/supplier/part at ≤ thousands of rows)
  are explicitly broadcast — no shuffle of the fact table;
- aggregations are partial (map-side combine) by construction since they
  are plain groupBy.agg of algebraic functions;
- top-k uses orderBy+limit which Spark executes as TakeOrderedAndProject
  (per-partition heap, no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nashville_etl_service_backup_spark.queries._util import davg, dsum, fmt_date
from nashville_etl_service_backup_spark.tables import load


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation with map-side
    combine; the shipdate filter reaches the parquet scan as a pushed
    predicate."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        # 2dp×2dp×2dp = exactly 6dp: scale 6 avoids halfway-rounding
        # ambiguity between engines at scale 4
        dsum(charge, scale=6).alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        davg(F.col("l_discount"), scale=6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-10.
    customer is small → broadcast; lineitem↔orders co-shuffle on orderkey."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    joined = (
        li.join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("l_orderkey", "o_orderpriority")
        .agg(
            dsum(revenue).alias("revenue"),
            F.max(fmt_date(F.col("o_orderdate"))).alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dims broadcast so the only shuffles
    are the lineitem↔orders and groupBy exchanges."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    dim = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        # TPC-H Q5 locality constraint: customer and supplier in same nation
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(dsum(revenue).alias("revenue"))


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (§2.9 gap): top-3 parts by retail price per brand.
    Partitioned window — scales as one shuffle on p_brand."""
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
    )


def q_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + grouped agg with COUNT(DISTINCT) (§2.5 gap)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    j = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
        dsum(F.col("o_totalprice")).alias("total_revenue"),
    )


def q_rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (§2.5 gap) with GROUPING() disambiguation."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
            "g_status",
            "g_priority",
        )
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame (running sum) per customer — §2.9 gap. Decimal window
    sum keeps the cumulative values exact and order-independent."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


def q_semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — customers with ≥1 urgent order."""
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — the load-dedup primitive J2/K2
    (transform_data.py:567-571) exercised relationally: customers with no
    orders in 2001."""
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return cust.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + pushed conjunctive predicate + single
    aggregate — the whole query is one WholeStageCodegen span, no
    shuffle beyond the final 1-row combine."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias(
            "revenue"
        )
    )


def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by year. Both nation
    lookups broadcast (aliased dim reuse); one fact co-shuffle on
    orderkey, one groupBy exchange."""
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(volume).alias("revenue"))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    join + agg + TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio (promo revenue share
    for one month); part broadcast into the fact scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return j.agg(
        F.round(
            F.lit(100.0) * dsum(promo, scale=6) / dsum(rev, scale=6), 6
        ).alias("promo_revenue_pct")
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp emulated via lineitem): distinct
    supplier count per (brand, type) for mid-size parts."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").between(10, 30)
    )
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand", "p_type").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact-side agg (orders with total
    quantity > 300), then joins back to customer/orders. The agg runs
    first so only the tiny qualifying set joins."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            fmt_date(F.col("o_orderdate")).alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate bands across the part join —
    exercises disjunctive predicate pushdown/evaluation."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    band1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    band2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(16, 30)
        & F.col("l_quantity").between(10, 20)
    )
    band3 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(31, 50)
        & F.col("l_quantity").between(20, 30)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(band1 | band2 | band3).agg(dsum(rev).alias("revenue"))


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global decimal-exact average
    balance, broadcast as a 1-row frame) + anti join (no orders in the
    final year) + agg per nation."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    nation = load(spark, sf_dir, "nation")
    avg_bal = cust.agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        idle.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_shipping_priority": q03_shipping_priority,
    "q05_local_supplier": q05_local_supplier,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_nation_volume": q07_nation_volume,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_supplier_count": q16_supplier_count,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_bands": q19_disjunctive_bands,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q_top_parts_per_brand": q_top_parts_per_brand,
    "q_customer_order_stats": q_customer_order_stats,
    "q_rollup_order_priority": q_rollup_order_priority,
    "q_running_total": q_running_total,
    "q_semi_join_urgent": q_semi_join_urgent,
    "q_anti_join_inactive": q_anti_join_inactive,
}

_DSUM = "CAST(SUM(CAST({e} AS DECIMAL(18,4))) AS DOUBLE)"

ORACLES = {
    "q06_forecast_revenue": """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
  AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
""",
    "q07_nation_volume": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""",
    "q10_returned_items": """
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "q14_promo_revenue": """
SELECT ROUND(
  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice*(1-l_discount) ELSE 0.0 END
               AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice*(1-l_discount)
               AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    "q16_supplier_count": """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 10 AND 30
GROUP BY p_brand, p_type
""",
    "q18_large_orders": """
WITH big AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300)
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "q19_disjunctive_bands": """
SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
       AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 16 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 31 AND 50
       AND l_quantity BETWEEN 20 AND 30)
""",
    "q22_idle_rich_customers": """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    AS avg_bal
  FROM customer),
rich AS (
  SELECT c_custkey, c_acctbal, c_nationkey
  FROM customer, avg_bal
  WHERE c_acctbal > avg_bal),
idle AS (
  SELECT * FROM rich
  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2001-01-01'))
SELECT n_name, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM idle JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "q03_shipping_priority": """
SELECT l_orderkey, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  MAX(strftime(o_orderdate, '%Y-%m-%d')) AS o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "q05_local_supplier": """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    "q_top_parts_per_brand": """
SELECT p_brand, p_partkey, p_name, p_retailprice, rn FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
    ROW_NUMBER() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part)
WHERE rn <= 3
""",
    "q_customer_order_stats": """
SELECT c_mktsegment,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT c_custkey) AS n_customers,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    "q_rollup_order_priority": """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "q_running_total": """
SELECT o_orderkey, o_custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_spend
FROM orders
""",
    "q_semi_join_urgent": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    "q_anti_join_inactive": """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
""",
}
