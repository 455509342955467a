"""Typed-schema surface — the reference's largest draft
(Kernel/Drafts/draft_type, 381 lines; draft:1-24 struct/enum/union
declarations). Spark's native answer:

- STRUCT columns: a declared `StructType` + `from_json` parse of the
  raw payload; field access is a Catalyst extraction (codegen, pruned
  to the accessed fields at the scan when the source is columnar).
- ENUM columns: a declared value domain; validation and
  ordinal-encoding are CASE/isin expressions. Invalid values surface
  as NULL ordinals (or as `ensure` violations via
  operators.constraints.domain — the two layers compose).

This is schema-as-expressions, not schema-as-storage: the reference
enforces types at write time in its kernel; on Spark the same
declarations compile into the read path, which is the idiomatic way
to type raw columnar data at 100-TB scale (no rewrite of the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from herodb_spark.catalog import load_table


class EnumType:
    """Declared enum domain (draft_type enum syntax): ordered labels,
    ordinal encoding, membership validation."""

    def __init__(self, name: str, labels: list[str]):
        self.name = name
        self.labels = list(labels)

    def is_valid(self, col: Column) -> Column:
        return F.coalesce(col.isin(self.labels), F.lit(False))

    def ordinal(self, col: Column) -> Column:
        """Label → 0-based ordinal; invalid/NULL → NULL."""
        expr = F.lit(None).cast("int")
        for i in reversed(range(len(self.labels))):
            expr = F.when(col == self.labels[i], F.lit(i)).otherwise(expr)
        return expr

    def label(self, ord_col: Column) -> Column:
        expr = F.lit(None).cast("string")
        for i in reversed(range(len(self.labels))):
            expr = F.when(ord_col == i, F.lit(self.labels[i])).otherwise(expr)
        return expr


EVENT_TYPE_ENUM = EnumType("event_type", ["click", "error", "purchase", "signup", "view"])

# events.props is a JSON payload; the declared struct schema types it
PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


def typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed view of `events`: props parsed into a declared
    struct, event_type validated against its enum domain."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("event_type"),
        EVENT_TYPE_ENUM.ordinal(F.col("event_type")).alias("type_ord"),
        EVENT_TYPE_ENUM.is_valid(F.col("event_type")).alias("type_valid"),
        F.from_json("props", PROPS_SCHEMA).alias("props"),
    )


def typed_struct_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: struct field access + enum encoding end to
    end — per event type: its enum ordinal, row count, how many rows
    failed the enum domain (0 on clean data), and aggregates over the
    struct field props.k."""
    t = typed_events(spark, sf_dir)
    return (
        t.groupBy("event_type")
        .agg(
            F.min("type_ord").alias("type_ord"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(~F.col("type_valid"), 1).otherwise(0)).alias("n_invalid"),
            F.sum(F.col("props.k").cast("long")).alias("sum_k"),
            F.max("props.k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_ORDINAL_CASE = "CASE event_type " + " ".join(
    f"WHEN '{v}' THEN {i}" for i, v in enumerate(EVENT_TYPE_ENUM.labels)
) + " END"

_DOMAIN = ", ".join(f"'{v}'" for v in EVENT_TYPE_ENUM.labels)

TYPED_STRUCT_ENUM_SQL = f"""
SELECT event_type,
       MIN({_ORDINAL_CASE}) AS type_ord,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN NOT COALESCE(event_type IN ({_DOMAIN}), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""
