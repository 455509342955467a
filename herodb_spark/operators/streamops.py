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
