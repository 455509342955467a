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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table lazily. No caching here — callers decide;
    at 100 TB you never blanket-cache the fact tables."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so spark.sql() queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
