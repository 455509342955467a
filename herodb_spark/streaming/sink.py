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


class DatabaseTxnSink:
    """foreachBatch callable: exactly-once MULTI-TABLE write. One
    micro-batch fans out to several member tables of a
    SnapshotDatabase (`routes`: table name -> transform of the batch
    into that table's upsert rows) and publishes with ONE atomic
    database pointer swap carrying the (sink_id, batch_id) watermark.

    Failure analysis (the reason this exists — a fact stream feeding
    both a fact table and a running aggregate must never show one
    without the other):
    - crash BETWEEN table commits: no pointer swap happened, readers
      stay on the pre-batch pin set; the replayed batch re-applies
      from scratch (recovery discards the orphaned table versions).
    - crash AFTER the swap, BEFORE the checkpoint commit: the replay
      sees batch_id <= last_txn(sink_id) and no-ops.
    - two replays racing: the database seq fences the loser
      (ConcurrentWriteError); it re-checks the watermark and treats
      an already-committed batch as success.

    `compact_every=N` runs database-scope small-file compaction over
    the routed tables after every Nth committed batch: each
    micro-batch leaves one parquet file per write task, so a
    streaming-fed table fragments linearly with batch count; the
    periodic OPTIMIZE pass (its own pin-swapped transaction, content
    bit-identical, cost ∝ fragmented partitions) keeps per-partition
    file counts bounded for readers.

    `backup_every=N` (with `backup_ring`) rotates a BackupRing slot
    after every Nth committed batch — the reference's "Auto Backup to
    file group ring": the pool's diff economy makes the steady-state
    cost proportional to what the last N batches wrote.

    `vacuum_every=N` (with `vacuum_keep_last`) runs database vacuum on
    the same cadence pattern: the sink publishes one database version
    per batch, so a long-running stream otherwise grows the manifest
    and the version-directory count without bound; retention GC keeps
    both ∝ keep_last while database time travel over the kept window
    (and every version it pins) stays intact.

    Both are MAINTENANCE, not part of the batch's exactly-once
    contract — the batch watermark commits first, a failing pass is
    swallowed (recorded on `last_maintenance_error`) instead of
    killing the streaming query, and a skipped/failed pass simply
    runs at a later cadence multiple."""

    def __init__(
        self,
        db,
        routes: dict,
        sink_id: str = "stream",
        compact_every: int | None = None,
        max_files_per_partition: int = 4,
        vacuum_every: int | None = None,
        vacuum_keep_last: int = 10,
        backup_every: int | None = None,
        backup_ring=None,
    ):
        if (backup_every is None) != (backup_ring is None):
            raise ValueError("backup_every and backup_ring come together")
        self.db = db
        self.routes = dict(routes)
        self.sink_id = sink_id
        self.compact_every = compact_every
        self.max_files_per_partition = max_files_per_partition
        self.vacuum_every = vacuum_every
        self.vacuum_keep_last = vacuum_keep_last
        self.backup_every = backup_every
        self.backup_ring = backup_ring
        #: last swallowed maintenance failure (None when healthy) —
        #: observability for operators without stream-fatal semantics
        self.last_maintenance_error: Exception | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from herodb_spark.sources.snapshot import ConcurrentWriteError

        bid = int(batch_id)
        if bid <= self.db.last_txn(self.sink_id):
            return  # replay of a published batch: no-op
        batch_df = batch_df.persist()  # N routes consume it; eval once
        try:
            with self.db.transaction(txn=(self.sink_id, bid)) as t:
                # each route targets its OWN member table: run the
                # statements on driver threads so their jobs overlap
                # (guide §2.6; Transaction._apply is lock-protected)
                from herodb_spark.session import run_overlapped

                run_overlapped(
                    *[
                        (lambda n=name, f=fn: t.merge_upsert(n, f(batch_df)))
                        for name, fn in self.routes.items()
                    ]
                )
        except ConcurrentWriteError:
            if bid > self.db.last_txn(self.sink_id):
                raise  # a real conflict, not our own batch landing
        finally:
            batch_df.unpersist()
        # maintenance AFTER the committed batch: best-effort — a lost
        # OCC race with a concurrent writer (or a transient storage
        # error) must not terminate the streaming query over a
        # non-essential pass; the next cadence multiple retries
        try:
            if self.compact_every and (bid + 1) % self.compact_every == 0:
                self.db.compact(
                    names=sorted(self.routes),
                    max_files_per_partition=self.max_files_per_partition,
                )
            if self.vacuum_every and (bid + 1) % self.vacuum_every == 0:
                self.db.vacuum(keep_last=self.vacuum_keep_last)
            if self.backup_every and (bid + 1) % self.backup_every == 0:
                # AUTO BACKUP (Kernel/README.md "Auto Backup to file
                # group ring"): rotate a ring slot every Nth committed
                # batch — diff-only, so steady-state cost ∝ the data
                # the last N batches wrote, never table size
                self.backup_ring.backup(self.db)
            self.last_maintenance_error = None
        except Exception as e:  # noqa: BLE001 — maintenance is best-effort
            self.last_maintenance_error = e


class BranchUpsertSink:
    """foreachBatch callable implementing WRITE-AUDIT-PUBLISH: the
    stream lands exactly-once in a DATABASE BRANCH (sources/branch.py)
    instead of the parent - readers of the parent never see unaudited
    data; validation queries run against the branch pin; `merge()`
    publishes the audited state in one atomic parent swap (or the
    branch is discarded and nothing ever surfaced). The modern
    lakehouse ingestion discipline, built from this repo's own branch +
    snapshot primitives.

    Exactly-once: the (sink_id, batch_id) watermark commits atomically
    with the branch pin advance, so a replayed micro-batch no-ops -
    same contract as SnapshotUpsertSink, at branch scope."""

    def __init__(self, branch, table: str, sink_id: str = "stream"):
        self.branch = branch
        self.table = table
        self.sink_id = sink_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.branch.merge_upsert(
            self.table, batch_df, txn=(self.sink_id, int(batch_id))
        )
