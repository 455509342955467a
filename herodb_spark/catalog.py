"""Table catalog: the herodb `data class` / `data` table surface
(reference Kernel/Drafts/draft:28-75) maps to parquet-backed typed
tables. Declared indexes map to physical layout hints:

- ``index Ordered(col)``  → sort-within-partitions on write / z-order
- ``index Hash(col)``     → bucketing / repartition on col
- ``index Unique(col)``   → enforced by dedup-on-write (mut_upsert)

Reads stay lazy DataFrames so Catalyst prunes columns and pushes
filters into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
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
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_confs(spark: SparkSession) -> None:
    """Runtime confs every query needs regardless of who built the
    session (the driver passes its own SparkSession):
    - events.parquet stores TIMESTAMP(NANOS), illegal for Spark's
      vectorized reader → read nanos as long, convert below;
    - UTC session tz so timestamp semantics match the (naive) oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs by `div` — truncation TOWARD ZERO, matching DuckDB's
        # ns→µs cast on the same values. (Pre-epoch timestamps would
        # differ from floor semantics by 1 µs; the synthetic log is
        # post-epoch, and any oracle must use the same truncation.)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table lazily. No caching here — callers decide;
    at 100 TB you never blanket-cache the fact tables."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so spark.sql() queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
