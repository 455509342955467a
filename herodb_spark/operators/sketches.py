"""Sketch-based corpus profiling — approximate aggregates that stay
single-pass at 100 TB.

Exact DISTINCT and exact percentiles need a full shuffle of the
grouping payload (and exact percentiles additionally a sort); at
corpus scale the standard practice is sketches: HyperLogLog++ for
distinct counts and the Greenwald-Khanna/KLL family for quantiles.
Spark ships both as JVM aggregates with map-side partial merge —
`approx_count_distinct` and `percentile_approx` — so the whole
profile is ONE shuffle of constant-size sketch state per group, no
matter the corpus size. (The reference's aggregation drafts,
draft:151-165, stop at exact Count/Average; this is the scale-out
closure of that surface, same as agg_percentiles' docstring promises.)

Both sketches are deterministic for a fixed input (fixed hash seeds,
deterministic merge), but not reproducible in DuckDB — so the
registered entry is a rows-only slot; the unit tests pin CORRECTNESS
differently: exact columns hash-equal the oracle, and the sketch
columns carry property-tested error bounds against their exact
counterparts (tests/test_sketches.py) plus pinned semantic anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table

# rsd 1.5% → ~2^14 HLL registers (~16 KB/group of state); the relative
# error the property test asserts is 3× the rsd (≈3σ)
HLL_RSD = 0.015
PCTL_ACCURACY = 10_000  # percentile_approx inverse-epsilon: ±0.01% rank error


def sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile over `documents`: exact row count
    (hash-checkable), HLL++ distinct text fingerprints, and KLL-style
    approximate length percentiles — one shuffle, constant-size state
    per group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.xxhash64(F.col("text")).alias("fp"),
            F.col("n_chars").cast("long").alias("len"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct("fp", rsd=HLL_RSD).alias("approx_distinct_texts"),
            F.percentile_approx("len", 0.5, PCTL_ACCURACY).alias("p50_len"),
            F.percentile_approx("len", 0.9, PCTL_ACCURACY).alias("p90_len"),
        )
        .orderBy("source")
    )


def exact_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact counterpart used by the property tests (and the honest
    cost comparison: this plan shuffles every distinct fingerprint
    instead of 16 KB of sketch state per group)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.xxhash64(F.col("text")).alias("fp"),
            F.col("n_chars").cast("long").alias("len"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("distinct_texts"),
            F.expr("percentile(len, 0.5)").alias("p50_exact"),
            F.expr("percentile(len, 0.9)").alias("p90_exact"),
        )
        .orderBy("source")
    )
