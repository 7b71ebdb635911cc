"""SparkSession factory.

Scale stance: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (vectorized pandas interchange), session timezone
pinned to UTC so timestamp semantics are deterministic across engines
(the DuckDB oracle reads naive parquet timestamps as-is).

``spark.sql.shuffle.partitions`` defaults to 32 to match the local[32]
harness; on a real cluster leave AQE's coalescing to right-size it
(initialPartitionNum can be raised via SPARK_GRAFT_SHUFFLE).

``spark.sql.adaptive.coalescePartitions.minPartitionSize`` is
env-overridable (SPARK_GRAFT_AQE_MIN_PART, default = Spark's 1 MB).
Round-7 experiment, NEGATIVE result kept for the record: with
parallelismFirst=true AQE targets max(total/defaultParallelism,
minPartitionSize), so on a small shuffle the 1 MB floor coalesces to
~6 partitions and the downstream projection runs at 6/32 parallelism;
a 64 KB floor restored full parallelism and won ~10% on a
single-session q_etl_pipeline probe — but the committed alternating
A/B over 10 representative queries
(BENCH_ISOLATIONS_r07/aqe{64kb,1mb}_run*.json) shows +2.2% TOTAL
(i.e. a small loss) with every per-query delta inside the ±10–20%
machine-noise band, so the default stays at Spark's 1 MB.
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
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PART", "1mb"),
        )
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
        (
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PART", "1mb"),
        ),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
