"""Lakehouse (Delta/Iceberg) connectors — import-gated.

The reference's `set/update/remove` statements map to MERGE INTO /
UPDATE / DELETE on a lakehouse table format. The jars are not in this
image, so the connectors degrade to a clear error; the plan-shape
equivalents (join-on-key + projection) live in operators/mutation.py
and are oracle-checked there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _delta_available(spark: SparkSession) -> bool:
    # py4j attribute access returns a lazy JavaPackage without raising,
    # so probe the classloader explicitly
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    fmt: str = "delta",
) -> None:
    """MERGE INTO target USING updates ON keys WHEN MATCHED UPDATE
    WHEN NOT MATCHED INSERT. Requires delta-spark / iceberg-runtime on
    the classpath."""
    if fmt == "delta" and not _delta_available(spark):
        raise NotImplementedError(
            "delta-spark jars not present in this environment; use "
            "sources.snapshot.SnapshotTable for a real copy-on-write "
            "MERGE (manifest commits, partition-scoped rewrite, time "
            "travel), or operators.mutation.upsert_table for the "
            "plan-shape equivalent"
        )
    if fmt not in ("delta", "iceberg"):
        raise ValueError(f"unsupported lakehouse format {fmt!r}")
    cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    updates.createOrReplaceTempView("_merge_source")
    spark.sql(
        f"MERGE INTO {fmt}.`{target_path}` t USING _merge_source s ON {cond} "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
