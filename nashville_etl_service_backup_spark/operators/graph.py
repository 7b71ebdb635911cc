"""Graph analytics beyond connected components (operators/dedup.py):
fixed-iteration PageRank as pure DataFrame algebra.

PageRank (Brin & Page 1998) with damping d: rank'(v) = (1-d)/n +
d · Σ_{u→v} rank(u)/outdeg(u), iterated a FIXED number of rounds —
the same determinism device as the IVF k-means quantizer
(similarity.py): a fixed iteration count unrolls into SQL, so the
DuckDB oracle replays the identical computation and hash-matches.

Cross-engine float determinism: per-round contribution sums are exact —
each contribution is round(rank/outdeg, 12) cast DECIMAL(38,12) and the
SUM happens in decimal (order-independent; a double sum would vary with
Spark's partial-aggregation order), then ONE correctly-rounded double
multiply/add chain per node: round((1-d)/n + d·sum, 12). Ranks are
therefore bit-identical across engines and across runs at every round.

Scale shape per round: one equi-join of the rank table (n rows) to the
degree-annotated edge table on src + one map-side-combinable
decimal-sum shuffle on dst. The outdeg join is paid ONCE before the
loop (not per round) into a persisted, src-partitioned edge table that
every round's join then reuses — the co-location a bucketed edge table
gives you at 100 TB. Rank state never visits the driver, and each
round's rank frame is localCheckpoint'ed (lazy) so the logical plan
stays round-sized instead of growing 3-joins-per-iteration deep —
without it, Catalyst re-optimizes an O(iterations)-deep tree and
planning time dominates the tiny per-round shuffles (measured 2.3×
end-to-end at sf0.1; results bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_SCALE = 12


def pagerank(
    edges: DataFrame,
    n_nodes: int,
    iterations: int = 5,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """Ranks after `iterations` rounds over `edges` (src, dst).

    Contract: every node appears as a src at least once (no dangling
    mass — true for any bidirected/bipartite-doubled edge list; add
    self-loops otherwise), and n_nodes is the exact node count.
    """
    from nashville_etl_service_backup_spark.operators import track_persist

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # annotate each edge with its source's outdeg ONCE, hash-partition
    # by src ONCE, persist: the per-round join against ranks reuses
    # both, so a round is exactly one join + one decimal-sum shuffle.
    edges_deg = track_persist(
        edges.join(out_deg, "src").repartition("src")
    )
    nodes = track_persist(
        edges_deg.select(F.col("src").alias("node")).distinct()
    )
    base = float(1.0 - damping) / float(n_nodes)
    # engine-side ROUND, not Python's round(): Python rounds half-even,
    # SQL ROUND half-up — the initial rank must use the same rule the
    # oracle's ROUND(1.0/n) uses
    ranks = nodes.withColumn(
        "rank",
        F.round(F.lit(1.0) / F.lit(float(n_nodes)), PR_SCALE),
    )
    for _ in range(iterations):
        # SHUFFLE_HASH on the rank-sized side (round-10 A/B: −15–25%,
        # ranks bit-identical — join strategy never changes the decimal
        # sums): sort-merge re-SORTED both sides every round; the rank
        # table is the provably smaller side (nodes ≪ edges) and its
        # per-partition build shard is bounded by n_nodes/partitions,
        # the §3.1 "moderately small per partition" case. At cluster
        # scale partition count rises with the graph (SPARK_GRAFT_
        # SHUFFLE), keeping the shard bounded; SMJ's only advantage —
        # graceful spill — buys nothing for a table this shape.
        rh = ranks.hint("SHUFFLE_HASH")
        contrib = edges_deg.join(
            rh, edges_deg["src"] == rh["node"]
        ).select(
            F.col("dst").alias("node"),
            F.round(F.col("rank") / F.col("outdeg"), PR_SCALE)
            .cast("decimal(38,12)")
            .alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(
            summed.hint("SHUFFLE_HASH"), "node", "left"
        ).select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                PR_SCALE,
            ).alias("rank"),
        )
        # lazy lineage cut: keeps the optimizer's tree one-round deep
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping: float = PR_DAMPING,
) -> str:
    """DuckDB twin: the fixed-iteration loop unrolled as CTEs — same
    decimal contribution sums, same rounded double update per round."""
    parts = [
        f"edges AS ({edges_sql})",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, ROUND(1.0 / n, {PR_SCALE}) AS rank"
        " FROM nodes, nn)",
    ]
    for i in range(iterations):
        parts.append(
            f"""s{i} AS (
  SELECT e.dst AS node,
    SUM(CAST(ROUND(r.rank / d.outdeg, {PR_SCALE}) AS DECIMAL(38,{PR_SCALE})))
      AS s
  FROM edges e JOIN r{i} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i + 1} AS (
  SELECT nodes.node,
    ROUND((1.0 - {damping!r}) / nn.n
          + {damping!r} * COALESCE(CAST(s.s AS DOUBLE), 0.0), {PR_SCALE})
      AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN s{i} s ON nodes.node = s.node)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iterations}"


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles (a < b < c) in an undirected graph given as an
    edge list (src, dst) — duplicates and orientation don't matter.

    The classic distributed algorithm (Suri & Vassilvitskii 2011,
    "Counting triangles and the curse of the last reducer"): canonical
    a<b edges, wedge generation via ONE equi-join on the shared middle
    vertex (a<b<c keeps each wedge unique), then a semi-join against
    the edge list to keep only closed wedges. Every join is an
    equi-join on vertex keys; work is Σ deg² for wedges — at scale,
    orient edges by degree (low→high) to tame the last-reducer skew.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = canon.alias("e1")
    e2 = canon.select(
        F.col("a").alias("b"), F.col("b").alias("c")
    ).alias("e2")
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = canon.select(F.col("a"), F.col("b").alias("c"))
    return wedges.join(closing, ["a", "c"], "left_semi")


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """Fixed-round parallel BFS (unit-weight Bellman–Ford): (node,
    dist) for every node within `rounds` hops of any seed node.

    Each round is one equi-join of the current distance table to the
    edge list on src plus one map-side-combinable integer MIN — the
    textbook iterative-relaxation shape (Malewicz et al. 2010, Pregel):
    distances only move as (node, int) pairs, never adjacency or
    payload data, and everything is exact integer arithmetic so the
    SQL unroll is trivially bit-identical. Lineage is cut lazily per
    round (the PageRank device) so the optimizer's tree stays
    round-sized. `seeds`: a (node) frame at distance 0."""
    dist = seeds.select("node", F.lit(0).alias("dist"))
    for _ in range(rounds):
        # NOTE (round 10): a SHUFFLE_HASH hint here — pagerank's
        # per-round device — measured +28% at sf0.1 (2.14 → 2.74 s,
        # probed and reverted): the planner broadcasts the small
        # frontier table, so forcing a shuffle joins worse. PageRank's
        # rank table sits behind a checkpoint (unknown size, planner
        # falls back to sort-merge), which is why the hint wins there.
        nxt = edges.join(
            dist, edges["src"] == dist["node"]
        ).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.lit(1)).alias("dist"),
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = dist.localCheckpoint(eager=False)
    return dist


def bfs_oracle_sql(
    edges_sql: str, seeds_sql: str, rounds: int
) -> str:
    """DuckDB twin of bfs_hops: the relaxation loop unrolled as CTEs
    (ends with the `d{rounds}` distance table; caller appends the
    terminal SELECT)."""
    parts = [
        f"edges AS ({edges_sql})",
        f"d0 AS (SELECT node, 0 AS dist FROM ({seeds_sql}) _seeds)",
    ]
    for i in range(rounds):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, d.dist + 1 AS dist"
            f" FROM edges e JOIN d{i} d ON e.src = d.node)"
        )
        parts.append(
            f"d{i + 1} AS (SELECT node, MIN(dist) AS dist FROM"
            f" (SELECT * FROM d{i} UNION ALL SELECT * FROM c{i}) _u"
            f" GROUP BY node)"
        )
    return ",\n".join(parts)
