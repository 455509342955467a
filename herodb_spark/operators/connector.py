"""Python Data Source connector exercised as a QUERY: a durable
snapshot table built from `documents`, mutated, then read back
through `spark.read.format("herodb")` — current snapshot, a
time-traveled version, and the change feed, tag-unioned into one
oracle-checkable frame.

The oracle is plain SQL over `documents` reproducing each leg's
semantics from the source rows alone, so a hash match proves the
whole durable round trip: copy-on-write versioning, the manifest
schema bindings, the per-file Arrow scan, and the per-commit
partition-value diff all reproduce exactly what the declarative
definitions say.

Reference: the storage engine reachable through the generic query
interface rather than only internal handles (Kernel/Source interface
split); CDC/time travel per Rewrite.md's durability periphery.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table


def pyds_snapshot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a `lang`-partitioned snapshot table from the 500
    lowest-id documents, commit one upsert (200 touched keys: half
    updates, half inserts) and one delete (short docs), then read
    every surface through the registered `herodb` format:

    - leg `current`: the live table,
    - leg `v0`: time travel to the creation version,
    - leg `cdc`: the change feed from version 0 (per-commit rows).

    Output: (leg, doc_id, lang, n_chars, change) ordered; `change`
    is NULL outside the cdc leg."""
    from herodb_spark.sources import pyds
    from herodb_spark.sources.snapshot import SnapshotTable

    pyds.register(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 500)
        .select("doc_id", "lang", "n_chars")
    )
    tmp = tempfile.mkdtemp(prefix="pyds_rt_")
    t = SnapshotTable.create(
        spark, os.path.join(tmp, "docs"), docs, key_cols=["doc_id"], partition_col="lang"
    )
    # commit 1: rewrite 100 existing keys (+1000 chars) and add 100
    # fresh keys above the id range, in one upsert. coalesce makes the
    # update change the image even for NULL n_chars (NULL + 1000 is
    # NULL and null-safe-equal to the pre-image, which the engine's
    # CDC diff would rightly suppress while a naive oracle still
    # emits the pre/post pair) — engine and oracle now agree on NULL
    # data by construction
    t.merge_upsert(
        docs.where(F.col("doc_id") < 100)
        .withColumn("n_chars", F.coalesce(F.col("n_chars"), F.lit(0)) + 1000)
        .unionByName(
            docs.where(F.col("doc_id") < 100).select(
                (F.col("doc_id") + 10000).alias("doc_id"), "lang", "n_chars"
            )
        )
    )
    # commit 2: delete the short tail
    t.delete_where(F.col("n_chars") < 200)

    fmt = spark.read.format("herodb").option("path", t.path)
    cur = fmt.load().select(
        F.lit("current").alias("leg"), "doc_id", "lang", "n_chars",
        F.lit(None).cast("string").alias("change"),
    )
    v0 = fmt.option("version", "0").load().select(
        F.lit("v0").alias("leg"), "doc_id", "lang", "n_chars",
        F.lit(None).cast("string").alias("change"),
    )
    cdc = (
        spark.read.format("herodb")
        .option("path", t.path)
        .option("mode", "changes")
        .option("changesFrom", "0")
        .load()
        .select(
            F.lit("cdc").alias("leg"), "doc_id", "lang", "n_chars",
            F.concat_ws("@", "_change", F.col("_commit_version").cast("string")).alias("change"),
        )
    )
    return cur.unionByName(v0).unionByName(cdc).orderBy("leg", "doc_id", "change")


PYDS_SNAPSHOT_ROUNDTRIP_SQL = """
WITH base AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 500
),
upserted AS (            -- state after commit 1
  SELECT doc_id, lang,
         CASE WHEN doc_id < 100 THEN COALESCE(n_chars, 0) + 1000 ELSE n_chars END AS n_chars
  FROM base
  UNION ALL
  SELECT doc_id + 10000, lang, n_chars FROM base WHERE doc_id < 100
),
final AS (               -- state after commit 2: the engine's
  -- delete_where coalesces its predicate to FALSE on NULL, so rows
  -- with NULL n_chars survive the delete
  SELECT * FROM upserted WHERE n_chars >= 200 OR n_chars IS NULL
),
cdc AS (
  -- commit 1: updates (pre/post) for rewritten keys whose row
  -- actually changed, inserts for the fresh keys
  SELECT doc_id, lang, n_chars, 'update_pre@1' AS change
    FROM base WHERE doc_id < 100
  UNION ALL
  SELECT doc_id, lang, COALESCE(n_chars, 0) + 1000, 'update_post@1'
    FROM base WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 10000, lang, n_chars, 'insert@1'
    FROM base WHERE doc_id < 100
  UNION ALL
  -- commit 2: deletes of the post-commit-1 short rows
  SELECT doc_id, lang, n_chars, 'delete@2'
    FROM upserted WHERE n_chars < 200
)
SELECT 'cdc' AS leg, doc_id, lang, n_chars, change FROM cdc
UNION ALL
SELECT 'current', doc_id, lang, n_chars, NULL FROM final
UNION ALL
SELECT 'v0', doc_id, lang, n_chars, NULL FROM base
ORDER BY leg, doc_id, change
"""
