"""True Structured Streaming runs of the streaming operators: the same
transform functions as the batch-parity queries, executed through
readStream → memory sink, compared against the batch results."""

from __future__ import annotations

from pyspark.sql import functions as F

from herodb_spark.catalog import load_table
from herodb_spark.streaming import ops as SO


def _run_stream_to_memory(spark, sdf, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("complete").trigger(availableNow=True).start()
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream_in = SO.stream_events(spark, sf_dir)
    out = _run_stream_to_memory(spark, SO.tumbling_agg(stream_in), "t_tumbling")
    batch = SO.tumbling_agg(load_table(spark, sf_dir, "events"))
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_stream_sessionize_matches_batch(spark, sf_dir):
    stream_in = SO.stream_events(spark, sf_dir)
    out = _run_stream_to_memory(spark, SO.sessionize(stream_in), "t_session")
    batch = SO.sessionize(load_table(spark, sf_dir, "events"))
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """True stream-stream join: both sides are streams with
    watermarks; availableNow run must equal the batch interval join."""
    s1 = SO.stream_events(spark, sf_dir)
    s2 = SO.stream_events(spark, sf_dir)
    joined = SO.purchase_click_join(
        s1.where(F.col("event_type") == "purchase"),
        s2.where(F.col("event_type") == "click"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM t_ssjoin").collect())
    ev = load_table(spark, sf_dir, "events")
    batch = SO.purchase_click_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_stream_sliding_window_matches_batch(spark, sf_dir):
    """Sliding windows (1h / 15min slide) through readStream must
    equal the batch F.window aggregation — the merged
    stream_window_aggs query's streaming half."""
    stream_in = SO.stream_events(spark, sf_dir)

    def sliding(df):
        return (
            df.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type",
                "n_events",
            )
        )

    out = _run_stream_to_memory(spark, sliding(stream_in), "t_sliding")
    batch = sliding(load_table(spark, sf_dir, "events"))
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_native_session_window_matches_lag_sessionize(spark, sf_dir):
    """Spark's built-in session_window (gap-based merging state in
    Structured Streaming) must produce the same sessions as the
    batch lag+cumsum sessionization — same 30-minute-gap semantics,
    two independent implementations."""
    ev = load_table(spark, sf_dir, "events")
    native = (
        ev.groupBy(F.session_window("ts", SO.SESSION_GAP).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
    got = sorted(tuple(r) for r in native.collect())
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in SO.sessionize(ev).collect()
    )
    assert got == want


def test_stream_dedup_dropduplicates(spark, sf_dir):
    """Batch/stream parity through the SAME function: dedup_keep_first
    dispatches to dropDuplicates on the streaming side and must equal
    the batch keep-first counts (event_ids are unique in the synthetic
    log, so keep-first == distinct)."""
    stream_in = SO.stream_events(spark, sf_dir)
    out = _run_stream_to_memory(spark, SO.dedup_keep_first(stream_in), "t_dedup")
    batch = SO.dedup_keep_first(load_table(spark, sf_dir, "events"))
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_stream_events_handles_both_ts_encodings(spark, tmp_path):
    """Schema-drift regression (round-3 breakage): the testdata has
    shipped events.ts both as TIMESTAMP(NANOS) — surfaced as int64
    under nanosAsLong — and as timestamp[us]. stream_events must read
    both and produce identical TIMESTAMP values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_us = [1_700_000_000_000_000, 1_700_000_123_456_789]
    rows = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "purchase"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    dirs = {}
    for enc, arr in {
        "ns": pa.array([t * 1000 for t in ts_us], type=pa.timestamp("ns")),
        "us": pa.array(ts_us, type=pa.timestamp("us")),
    }.items():
        d = tmp_path / enc
        d.mkdir()
        pq.write_table(pa.table({**rows, "ts": arr}), d / "events.parquet")
        dirs[enc] = str(d)

    out = {}
    for enc, d in dirs.items():
        sdf = SO.stream_events(spark, d)
        assert dict(sdf.dtypes)["ts"] == "timestamp"
        res = _run_stream_to_memory(
            spark, sdf.groupBy("event_id").agg(F.max("ts").alias("ts")), f"t_enc_{enc}"
        )
        out[enc] = sorted(tuple(r) for r in res.collect())
    assert out["ns"] == out["us"]
    assert len(out["us"]) == 2
