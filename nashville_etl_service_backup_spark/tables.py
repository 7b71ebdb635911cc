"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

Pure ``spark.read.parquet`` — scans stay columnar, filters/projections
pushed by Catalyst reach the parquet reader (PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which the Spark parquet
        # reader rejects; read nanos as long and convert to a microsecond
        # timestamp (truncating division — matches DuckDB's nanos→micros
        # read behavior exactly, verified bit-for-bit).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
