"""SparkSession factory.

Scale stance: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (vectorized pandas interchange), session timezone
pinned to UTC so timestamp semantics are deterministic across engines
(the DuckDB oracle reads naive parquet timestamps as-is).

``spark.sql.shuffle.partitions`` defaults to 32 to match the local[32]
harness; on a real cluster leave AQE's coalescing to right-size it
(initialPartitionNum can be raised via SPARK_GRAFT_SHUFFLE).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nashville-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we did not build
    (e.g. the driver's); never fails on immutable ones."""
    for k, v in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
