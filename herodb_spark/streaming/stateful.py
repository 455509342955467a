"""Custom stateful streaming operator via applyInPandasWithState —
the Spark-native form of herodb's incremental computed tables
(`data ... :- rule` with Cache index, Kernel/Drafts/draft:55-75):
state that updates as the log grows.

Operator: per-user running spend monitor. For each user, maintain
(total_value, n_events) across micro-batches and emit one row per
batch with the updated totals — i.e. an incrementally-maintained
aggregate, the streaming analog of a cached computed table.

Works in both modes:
- streaming: groupBy(user_id).applyInPandasWithState(...) with
  GroupStateTimeout.NoTimeout — state lives in the state store,
  scales horizontally by key.
- batch (for tests/oracle): the same fold expressed as a groupBy —
  identical results when the whole log is one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]})


def running_spend_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming form: incrementally-maintained per-user totals."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_spend_batch(events: DataFrame) -> DataFrame:
    """Batch-equivalent fold (single micro-batch semantics)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
