"""Structured Streaming operators over the events log.

The reference's WAL/transaction-log design (Rewrite.md:4-16 — ordered
log of updates, replay on recovery) maps to Spark's streaming model:
an append-only event source, watermarks for late data, windowed state,
exactly-once sinks via checkpointing.

Each transform here is written against a plain DataFrame so the SAME
function serves the batch oracle-checked query and the readStream
pipeline (batch/stream parity is the point of Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"
WATERMARK = "2 hours"


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling window counts/sums per event_type. In streaming
    mode the groupBy state is bounded by the watermark."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user via
    F.session_window — native streaming state operator; in batch mode
    it compiles to a sort-based session assignment."""
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def dedup_keep_first(events: DataFrame) -> DataFrame:
    """Idempotent ingestion: keep the first occurrence per event_id,
    then count survivors per type — ONE function for both modes, like
    every transform in this module.

    Streaming input → dropDuplicatesWithinWatermark on event_id:
    "first" = first ARRIVAL, and — critically — the state store
    EVICTS entries once the watermark passes them. Plain
    dropDuplicates(["event_id"]) without the event-time column in the
    subset never evicts (one state entry per distinct id, forever) —
    the classic unbounded-state trap this module exists to avoid.
    Duplicates are assumed to arrive within the watermark delay (the
    definition of a late duplicate). Batch input → row_number over a
    fully-determining order: "first" = minimum of (ts, user_id,
    event_type, value). The two coincide whenever event_ids are
    unique (the synthetic log — asserted by the streaming parity
    test); with true duplicate ids, arrival order is the only "first"
    a stream can know."""
    if events.isStreaming:
        first = events.dropDuplicatesWithinWatermark(["event_id"])
    else:
        from pyspark.sql import Window

        # fully-determining order: a duplicate event_id tying on (ts,
        # user_id) but differing in event_type/value would otherwise
        # make the kept row — and the per-type counts —
        # nondeterministic
        w = Window.partitionBy("event_id").orderBy("ts", "user_id", "event_type", "value")
        first = (
            events.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    return first.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique_events"))


def purchase_click_join(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding 30 minutes. In streaming mode both
    sides carry watermarks and the time-range condition bounds the
    join state (the canonical Structured Streaming stream-stream
    join); in batch mode the same expression is an equi-join + range
    filter."""
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user_id)
            & (c.c_ts <= p.p_ts)
            & (c.c_ts >= p.p_ts - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream version of the events table (file source), sharing
    the batch catalog's conf-setting and ts normalization
    (catalog.normalize_event_ts handles both ts encodings; the stream
    side additionally gets TIMESTAMP for watermark eligibility)."""
    import os

    from herodb_spark.catalog import _ensure_confs, normalize_event_ts

    _ensure_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file source wants a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw, streaming=True).withWatermark("ts", WATERMARK)
