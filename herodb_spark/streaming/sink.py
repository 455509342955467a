"""Exactly-once streaming sink into snapshot tables.

Completes the reference's durability mapping (Rewrite.md:4-16 —
ordered log of updates, replay on recovery): Structured Streaming is
the ordered log + replay machinery, sources/snapshot.py is the
transactional table, and this sink is the idempotent bridge between
them — the same (sink_id, batch_id) transactional-write pattern the
Delta/Iceberg streaming sinks use.

Why idempotence is the whole game: Structured Streaming guarantees a
micro-batch is REPLAYED after a crash that falls between the sink
write and the checkpoint commit. A naive sink applies that batch
twice. Here `SnapshotTable.merge_upsert` records the batch id in the
SAME atomic manifest commit as the data, so the replay sees
`batch_id <= last_txn(sink_id)` and no-ops — end-to-end exactly-once
with no coordination beyond the manifest rename.

Usage (update-mode aggregation → upsert):

    sink = SnapshotUpsertSink(table, sink_id="spend")
    (agg_stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start())

The upstream query must emit at most one row per key per batch
(aggregations in update mode do); merge_upsert enforces the MERGE
contract beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from herodb_spark.sources.snapshot import SnapshotTable


class SnapshotUpsertSink:
    """foreachBatch callable: exactly-once upsert of each micro-batch
    into a SnapshotTable."""

    def __init__(self, table: SnapshotTable, sink_id: str = "stream"):
        self.table = table
        self.sink_id = sink_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.table.merge_upsert(batch_df, txn=(self.sink_id, int(batch_id)))
