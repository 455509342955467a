"""SparkSession factory tuned for the engine.

Scale posture: these configs are chosen so the same logical plans
survive a 1000-executor / 100 TB deployment — AQE re-plans shuffles
at runtime (partition coalescing + skew-join splitting), broadcast
threshold catches the dimension tables, and the session timezone is
pinned to UTC so timestamp semantics are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def literal_df(spark: SparkSession, rows: list, schema) -> "DataFrame":
    """Single-partition DataFrame from driver-side literal rows.

    ``createDataFrame(list)`` parallelizes tiny literals across
    defaultParallelism partitions; a follow-up ``coalesce(1)`` then
    pays one Python-worker round-trip PER source partition on every
    action (~5 s at local[32] — measured on the 13-row class-hierarchy
    edge list), and without coalescing, iterative operators inherit 32
    near-empty partitions into every union. Parallelizing to ONE slice
    up front makes each action a single worker round-trip. Seeds,
    edge-list metadata, and ground facts should all come through
    here."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def get_spark(app_name: str = "herodb_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``local[$SPARK_GRAFT_CPUS]`` in this environment; on a real
    cluster the master/resource configs come from spark-submit and
    everything here still applies.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # Local mode: match cores so one wave of tasks covers the
        # shuffle. On a cluster this is overridden by AQE coalescing
        # anyway (advisoryPartitionSizeInBytes governs).
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
