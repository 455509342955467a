"""Batch-parity entry points for the streaming operators (driver
correctness gate runs these as batch; tests/test_streaming.py runs the
same transforms through readStream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table
from herodb_spark.streaming import ops as SO


def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return SO.tumbling_agg(ev).orderBy("window_start", "event_type")


STREAM_TUMBLING_AGG_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return SO.sessionize(ev).orderBy("user_id", "session_start")


# Session semantics: a new session starts when the gap from the
# previous event of the same user is > 30 minutes; session_start is
# the first event's timestamp (µs, truncated like the catalog does).
STREAM_SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS is_new
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM e
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sess ORDER BY user_id, session_start
"""


def stream_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h), sliding (1h window / 15min slide), and all-time
    keep-first-dedup aggregates in one derived table, tagged by
    `win_kind` — the registered merge of `stream_tumbling_agg`,
    `stream_sliding_agg`, `stream_late_dedup`, `stream_sessionize`
    (since round 5), and `stream_interval_join` (since round 7's
    window rebalance; each constituent kept for unit/streaming tests
    and for bench.py, which times the standalone sessionize). The
    windowed branches run as F.window group-bys — exactly the
    Structured Streaming plan shape; the dedup branch is the batch
    parity of dropDuplicates-with-watermark (window = all time); the
    session branch reuses the 30-min-gap sessionization with user_id
    carried in the tag-union's key column; the interval branch is the
    stream-stream time-bounded join at row grain (purchase_ts/user in
    the key columns, purchase/click ids carried exactly — event ids
    are far below 2^53, so the double cast is lossless)."""
    ev = load_table(spark, sf_dir, "events")
    interval = stream_interval_join(spark, sf_dir).select(
        F.lit("interval_join_30m").alias("win_kind"),
        F.col("purchase_ts").alias("window_start"),
        F.col("user_id").cast("string").alias("event_type"),
        F.col("purchase_id").cast("long").alias("n_events"),
        F.col("click_id").cast("double").alias("total_value"),
    )
    session = SO.sessionize(ev).select(
        F.lit("session_30m").alias("win_kind"),
        F.col("session_start").alias("window_start"),
        F.col("user_id").cast("string").alias("event_type"),
        "n_events",
        "total_value",
    )
    tumbling = SO.tumbling_agg(ev).select(
        F.lit("tumbling_1h").alias("win_kind"), "window_start", "event_type", "n_events", "total_value"
    )
    dedup = SO.dedup_keep_first(ev).select(
        F.lit("dedup_all_time").alias("win_kind"),
        F.lit(None).cast("string").alias("window_start"),
        "event_type",
        F.col("n_unique_events").alias("n_events"),
        F.lit(None).cast("double").alias("total_value"),
    )
    sliding = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("total_value"),
        )
        .select(
            F.lit("sliding_1h_15m").alias("win_kind"),
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        tumbling.unionByName(sliding)
        .unionByName(dedup)
        .unionByName(session)
        .unionByName(interval)
        # n_events/total_value break ties for the interval branch
        # (several clicks can share (purchase_ts, user)); the agg
        # branches are already unique per (win_kind, start, type)
        .orderBy("win_kind", "window_start", "event_type", "n_events", "total_value")
    )


STREAM_WINDOW_AGGS_SQL = f"""
SELECT * FROM (
  SELECT 'tumbling_1h' AS win_kind,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type,
         COUNT(*) AS n_events,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
  FROM events GROUP BY 2, 3
  UNION ALL
  SELECT 'sliding_1h_15m',
         strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S'),
         event_type,
         COUNT(*),
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
  FROM events, generate_series(0, 3) t(k)
  GROUP BY 2, 3
  UNION ALL
  SELECT 'dedup_all_time',
         CAST(NULL AS VARCHAR),
         event_type,
         n_unique_events,
         CAST(NULL AS DOUBLE)
  FROM (
    WITH first AS (
      SELECT * FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id, event_type, value) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT event_type, COUNT(*) AS n_unique_events FROM first GROUP BY event_type
  )
  UNION ALL
  SELECT 'session_30m',
         session_start,
         CAST(user_id AS VARCHAR),
         n_events,
         total_value
  FROM ({STREAM_SESSIONIZE_SQL})
  UNION ALL
  SELECT 'interval_join_30m',
         p.purchase_ts,
         CAST(p.user_id AS VARCHAR),
         CAST(p.purchase_id AS BIGINT),
         CAST(p.click_id AS DOUBLE)
  FROM (
    SELECT e1.user_id,
           e1.event_id AS purchase_id,
           e2.event_id AS click_id,
           strftime(e1.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts <= e1.ts
     AND e2.ts >= e1.ts - INTERVAL 30 MINUTE
    WHERE e1.event_type = 'purchase' AND e2.event_type = 'click'
  ) p
) ORDER BY win_kind, window_start, event_type, n_events, total_value
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-parity form of the stream-stream interval join."""
    ev = load_table(spark, sf_dir, "events")
    out = SO.purchase_click_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
    )
    return out.orderBy("user_id", "purchase_id", "click_id")


STREAM_INTERVAL_JOIN_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY p.user_id, purchase_id, click_id
"""


def stream_late_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return SO.dedup_keep_first(ev).orderBy("event_type")


STREAM_LATE_DEDUP_SQL = """
WITH first AS (
  SELECT * FROM (
    SELECT event_type,
           ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id, event_type, value) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT event_type, COUNT(*) AS n_unique_events FROM first GROUP BY event_type ORDER BY event_type
"""
