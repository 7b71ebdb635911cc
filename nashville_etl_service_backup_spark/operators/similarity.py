"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. The
  query vector is broadcast (1-row crossJoin); the dot product is a
  higher-order-function fold (JVM-side, no Python). At 100 TB this is a
  single scan + TakeOrderedAndProject (per-partition heap), no shuffle
  of the embedding column.
- lsh_bucket_topk: the scale path — sign-random-projection buckets
  (hyperplanes derived deterministically from md5, so the plan is
  reproducible without a driver-side RNG); candidates = buckets matching
  the query in ≥1 band; exact cosine re-rank on the (much smaller)
  candidate set.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query frame (column `qv`)."""
    v = as_double(F.col(vec_col))
    scored = (
        emb.crossJoin(F.broadcast(query))
        .withColumn("_cos", cosine(v, F.col("qv")))
    )
    return (
        scored.orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, *extra_cols, F.round("_cos", 4).alias("cosine"))
    )


def _plane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from md5 bytes."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane:{seed}:{i}".encode()).digest()
        for off in range(0, 16, 2):
            u = int.from_bytes(h[off : off + 2], "big") / 65535.0
            vals.append(2.0 * u - 1.0)
            if len(vals) == dim:
                break
        i += 1
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per plane."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    extra_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """ANN: restrict to the query's SRP bucket, exact-rank inside it.

    At scale the bucket column is a partition key: writing the corpus
    bucketed by it turns every query into a single-partition scan.
    """
    planes = [_plane(s, dim) for s in range(n_planes)]
    v = as_double(F.col(vec_col))
    bucketed = emb.withColumn("_bucket", srp_bucket(v, planes))
    q = query.withColumn("_qbucket", srp_bucket(F.col("qv"), planes))
    cand = bucketed.join(
        F.broadcast(q), F.col("_bucket") == F.col("_qbucket")
    ).withColumn("_cos", cosine(v, F.col("qv")))
    return (
        cand.orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, *extra_cols, F.round("_cos", 4).alias("cosine"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicates: SRP-bucket candidate generation
    (equi-join on bucket), exact cosine verification ≥ threshold."""
    planes = [_plane(1000 + s, dim) for s in range(n_planes)]
    v = as_double(F.col(vec_col))
    b = emb.select(
        F.col(id_col).alias("doc_id"),
        v.alias("v"),
        srp_bucket(v, planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .withColumn("cosine", cosine(F.col("l.v"), F.col("r.v")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )
