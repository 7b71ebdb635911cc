"""Second relational coverage wave: the remaining TPC-H query shapes
(Q2/Q4/Q8/Q9/Q11/Q12/Q13/Q15/Q17/Q20/Q21) adapted to the driver's
reduced star schema (no partsupp / commitdate / shipmode — supply cost
is emulated from lineitem, "late" means shipped > 60 days after order
date), plus the §2.4/§2.7 gap operators: as-of join, keyed range join,
INTERSECT/EXCEPT.

Every query keeps the *operator shape* of its TPC-H counterpart —
correlated scalar subqueries, HAVING over scalar totals, left-outer
count distributions, multi-EXISTS self-join rewritten as conditional
distinct aggregation — because the shape, not the constants, is what
exercises the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.operators.joins import (
    asof_join,
    range_join_agg,
)
from nashville_etl_service_backup_spark.queries._util import (
    davg,
    dsum,
    fmt_ts,
)
from nashville_etl_service_backup_spark.tables import load


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part MIN over a join (correlated-subquery
    rewrite), equality join back, top-20. Supply cost is emulated as the
    minimum observed extended price per (part, supplier). All dims
    broadcast; the per-part min is a map-side-combinable agg."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    li = load(spark, sf_dir, "lineitem")
    pair = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    min_cost = pair.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        pair.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(20)
    )


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a cross-table
    predicate (a lineitem shipped >60 days after the order date), then
    count per priority."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional-aggregate
    ratio per year over a 6-way join (ASIA customers, PROMO parts,
    NATION_7 suppliers' share)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cn = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    )
    target = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(dsum(target, scale=6) / dsum(vol, scale=6), 6).alias(
                "mkt_share"
            )
        )
    )


def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year with a part-name
    substring filter; supply cost emulated as half the part's retail
    price per unit."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
    ).agg(dsum(profit).alias("sum_profit"))


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped value with HAVING against a scalar
    subquery (fraction of the global total). The 1-row total is
    broadcast; both sides are decimal-exact so the > comparison is
    engine-stable."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(supp.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = li.groupBy("l_partkey").agg(
        dsum(value, scale=2).alias("part_value")
    )
    total = li.agg(dsum(value, scale=2).alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.0005) * F.col("_total"))
        .select("l_partkey", "part_value")
    )


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counts split by a category
    (line status standing in for ship mode)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.count(F.when(high, F.lit(1))).alias("high_line_count"),
        F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join (customers with zero orders kept)
    → per-customer count → distribution of counts."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar-max subquery + equality
    join back (ties all returned, like the spec)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("_max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part AVG subquery — lines of one
    brand with quantity below 20% of that part's average quantity."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li = load(spark, sf_dir, "lineitem")
    brand_li = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    small = brand_li.join(
        F.broadcast(avg_qty),
        (F.col("l_partkey") == F.col("_pk"))
        & (F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")),
    )
    return small.agg(
        F.round(dsum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly")
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers in AFRICA who
    shipped >80 units of some 'blue*' part since 1998."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("blue"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= _ts("1998-01-01")
    )
    heavy = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 80)
        .select("l_suppkey")
        .distinct()
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS/NOT-EXISTS double self-join rewritten
    as conditional distinct aggregation per order (the scalable
    formulation: ONE pass over the order's lines instead of two
    self-joins): multi-supplier finished orders where exactly one
    supplier shipped late — count such orders per that supplier.

    The qualifying condition n_late_supp == 1 means each target order
    has exactly ONE distinct late supplier, so max(when(late, suppkey))
    over the same per-order aggregate IS that supplier — the waiting
    count per supplier is then a plain count over the per-order frame,
    with no second scan of lineitem, no semi-join back, and no second
    distinct aggregation (round-9: 2 lineitem passes → 1; the old
    late-lines ⋈ target ⋈ countDistinct tail produced the identical
    rows because every surviving (supplier, order) pair is unique by
    construction)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = lo.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("_late_supp"),
    )
    target = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        target.groupBy(F.col("_late_supp").alias("l_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 gap: INTERSECT + EXCEPT — customers active in both 1999 and
    2000 minus those who ever placed an urgent order."""
    orders = load(spark, sf_dir, "orders")
    y99 = orders.filter(
        (F.col("o_orderdate") >= _ts("1999-01-01"))
        & (F.col("o_orderdate") < _ts("2000-01-01"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    y00 = orders.filter(
        (F.col("o_orderdate") >= _ts("2000-01-01"))
        & (F.col("o_orderdate") < _ts("2001-01-01"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return y99.intersect(y00).exceptAll(urgent.distinct())


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.4 gap): each purchase event picks the latest click
    of the same user at-or-before it. Right side pre-deduped per
    (user, ts) by max event_id so the match is deterministic; the join
    itself is the union + keyed-window composition (one shuffle)."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("_m"))
        .select(
            "user_id",
            "ts",
            F.col("_m.event_id").alias("click_id"),
            F.col("_m.value").alias("click_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_id", "click_value"],
        how="left",
    )
    return out.select(
        "event_id",
        "user_id",
        fmt_ts(F.col("ts")).alias("ts"),
        "value",
        "click_id",
        "click_value",
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed range join (§2.4 gap): per purchase, aggregate the same
    user's clicks in the preceding 24 hours (band predicate inside the
    equi-join — no cross product)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    out = range_join_agg(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower=F.col("_rt") > F.col("_lt") - F.expr("INTERVAL 24 HOURS"),
        upper=F.col("_rt") <= F.col("_lt"),
        aggs=[
            F.count("click_id").alias("n_clicks_24h"),
            F.coalesce(dsum(F.col("value"), scale=6), F.lit(0.0)).alias(
                "click_value_24h"
            ),
        ],
        group_cols=["event_id"],
    )
    return out


QUERIES = {
    "q02_min_cost_supplier": q02_min_cost_supplier,
    "q04_order_priority": q04_order_priority,
    "q08_market_share": q08_market_share,
    "q09_product_profit": q09_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_priority_by_status": q12_priority_by_status,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q_intersect_except": q_intersect_except,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
}

_DSUM4 = "CAST(SUM(CAST({e} AS DECIMAL(18,4))) AS DOUBLE)"
_DSUM2 = "CAST(SUM(CAST({e} AS DECIMAL(18,2))) AS DOUBLE)"
_DSUM6 = "CAST(SUM(CAST({e} AS DECIMAL(18,6))) AS DOUBLE)"

ORACLES = {
    "q02_min_cost_supplier": """
WITH pair AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
    MIN(l_extendedprice) AS cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN part ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20
  GROUP BY 1, 2, 3, 4, 5),
mc AS (
  SELECT p_partkey AS pk, MIN(cost) AS min_cost FROM pair GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, cost
FROM pair JOIN mc ON p_partkey = pk AND cost = min_cost
ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
LIMIT 20
""",
    "q04_order_priority": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
    "q08_market_share": """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  ROUND(
    {num} / {den}, 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND c_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'ASIA')
GROUP BY 1
""".format(
        num=_DSUM6.format(
            e="CASE WHEN sn.n_name = 'NATION_7'"
            " THEN l_extendedprice*(1-l_discount) ELSE 0.0 END"
        ),
        den=_DSUM6.format(e="l_extendedprice*(1-l_discount)"),
    ),
    "q09_product_profit": f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
  {_DSUM4.format(e="l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity")}
    AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    "q11_important_stock": f"""
WITH af AS (
  SELECT l_partkey, l_extendedprice, l_quantity
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')),
pp AS (
  SELECT l_partkey,
    {_DSUM2.format(e="l_extendedprice*l_quantity")} AS part_value
  FROM af GROUP BY l_partkey),
tot AS (
  SELECT {_DSUM2.format(e="l_extendedprice*l_quantity")} AS total FROM af)
SELECT l_partkey, part_value
FROM pp, tot
WHERE part_value > 0.0005 * total
""",
    "q12_priority_by_status": """
SELECT l_linestatus,
  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END)
    AS high_line_count,
  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END)
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    "q13_order_count_distribution": """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
""",
    "q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey,
    {_DSUM4.format(e="l_extendedprice*(1-l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    "q17_small_quantity_revenue": f"""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')),
aq AS (
  SELECT l_partkey AS pk,
    ROUND({_DSUM4.format(e="l_quantity")}/COUNT(*), 6) AS avg_qty
  FROM brand_li GROUP BY 1)
SELECT ROUND({_DSUM4.format(e="l_extendedprice")}/7.0, 6) AS avg_yearly
FROM brand_li JOIN aq ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
""",
    "q20_excess_suppliers": f"""
WITH heavy AS (
  SELECT DISTINCT l_suppkey
  FROM (
    SELECT l_suppkey, l_partkey,
      {_DSUM4.format(e="l_quantity")} AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
    GROUP BY l_suppkey, l_partkey)
  WHERE qty > 80)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (SELECT l_suppkey FROM heavy)
""",
    "q21_waiting_supplier": """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
    (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey AS ok,
    COUNT(DISTINCT l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY 1),
target AS (
  SELECT ok FROM per_order WHERE n_supp >= 2 AND n_late_supp = 1)
SELECT s_name, COUNT(DISTINCT l_orderkey) AS numwait
FROM lo
JOIN supplier ON l_suppkey = s_suppkey
WHERE late AND l_orderkey IN (SELECT ok FROM target)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
    "q_intersect_except": """
(SELECT o_custkey AS c_custkey FROM orders
 WHERE o_orderdate >= TIMESTAMP '1999-01-01'
   AND o_orderdate < TIMESTAMP '2000-01-01'
 INTERSECT
 SELECT o_custkey AS c_custkey FROM orders
 WHERE o_orderdate >= TIMESTAMP '2000-01-01'
   AND o_orderdate < TIMESTAMP '2001-01-01')
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderpriority = '1-URGENT'
""",
    "q_asof_join": """
WITH c AS (
  SELECT user_id, ts, MAX(event_id) AS click_id,
    arg_max(value, event_id) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts),
p AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, p.value,
  c.click_id, c.click_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
    "q_range_join": f"""
WITH p AS (
  SELECT event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, event_id AS click_id, value
  FROM events WHERE event_type = 'click')
SELECT p.event_id,
  COUNT(c.click_id) AS n_clicks_24h,
  COALESCE({_DSUM6.format(e="c.value")}, 0.0) AS click_value_24h
FROM p
LEFT JOIN c ON p.user_id = c.user_id
  AND c.ts > p.ts - INTERVAL 24 HOUR
  AND c.ts <= p.ts
GROUP BY p.event_id
""",
}
