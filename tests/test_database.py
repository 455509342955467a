"""SnapshotDatabase: multi-table atomic transactions (the database
scope of reference Rewrite.md:3-16 — parallel-queued updates, one
apply point, conflict cancel, recovery after shutdown at any timing).

The load-bearing tests are crash injection: a transaction that
committed table A and died before table B (or before the database
pointer swap) must be INVISIBLE to every reader, and recovery must
heal the member tables back to the consistent pin set.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from herodb_spark.sources.database import SnapshotDatabase, Transaction
from herodb_spark.sources.snapshot import ConcurrentWriteError


def _mkdb(spark, tmp_path):
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    acct = spark.createDataFrame(
        [(i, f"u{i}", float(100 * i)) for i in range(1, 6)], "id long, name string, bal double"
    )
    log = spark.createDataFrame([(0, "init")], "seq long, what string")
    db.create_table("accounts", acct, key_cols=["id"])
    db.create_table("audit", log, key_cols=["seq"])
    return db


def _bal(db, db_version=None):
    return {
        r.id: r.bal for r in db.read("accounts", db_version=db_version).collect()
    }


def test_txn_commits_all_tables_atomically(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    upd = spark.createDataFrame([(1, "u1", 999.0)], "id long, name string, bal double")
    entry = spark.createDataFrame([(1, "credit u1")], "seq long, what string")
    with db.transaction() as t:
        t.merge_upsert("accounts", upd)
        t.merge_upsert("audit", entry)
    assert _bal(db)[1] == 999.0
    assert db.read("audit").count() == 2
    hist = db.history()
    assert hist[-1]["op"] == "txn"
    # one database version for the whole transaction, both pins advanced
    assert hist[-1]["tables"]["accounts"] == 1 and hist[-1]["tables"]["audit"] == 1


def test_crash_between_table_commits_is_invisible_and_recoverable(spark, tmp_path):
    """Commit table A, die before table B and before the pointer swap:
    readers (fresh handles included) see the full pre-state; recovery
    rolls A back; a replay then lands both atomically."""
    db = _mkdb(spark, tmp_path)
    pre = _bal(db)
    upd = spark.createDataFrame([(2, "u2", -1.0)], "id long, name string, bal double")

    t = Transaction(db)
    t.__enter__()
    t.merge_upsert("accounts", upd)  # table-level commit lands...
    # ...CRASH: no audit write, no t.commit(), no __exit__

    # a fresh reader resolves through the database pin — consistent pre-state
    db2 = SnapshotDatabase(spark, db.path)
    assert _bal(db2) == pre
    assert db2.read("audit").count() == 1
    # but the member table's own manifest DID run ahead (the leak recovery heals)
    assert db2.table("accounts")._load()["current"] == 1

    healed = db2.recover()
    assert healed == {"accounts": 1}
    assert db2.table("accounts")._load()["current"] == 0
    assert _bal(db2) == pre

    # replay: the same logical transaction, this time to completion
    entry = spark.createDataFrame([(1, "debit u2")], "seq long, what string")
    with db2.transaction() as t2:
        t2.merge_upsert("accounts", upd)
        t2.merge_upsert("audit", entry)
    assert _bal(db2)[2] == -1.0
    assert db2.read("audit").count() == 2


def test_crashed_writer_cannot_publish_after_recovery(spark, tmp_path):
    """Fencing: a transaction that started before recovery (its table
    commits were rolled back) must NOT be able to swing the database
    pointer afterwards — its pins would resurrect dropped versions."""
    db = _mkdb(spark, tmp_path)
    upd = spark.createDataFrame([(3, "u3", 7.0)], "id long, name string, bal double")
    t = Transaction(db)
    t.__enter__()
    t.merge_upsert("accounts", upd)
    # another process heals the half-applied state
    SnapshotDatabase(spark, db.path).recover()
    with pytest.raises(ConcurrentWriteError):
        t.commit()


def test_disjoint_table_txn_race_both_survive(spark, tmp_path):
    """Two transactions touching DIFFERENT tables race at the database
    pointer: since round 7 the swap loser REBASES onto the winner's
    pins and retries (cost arbitration — Rewrite.md:9-13) instead of
    cancelling, so both transactions land and neither pin is dropped."""
    db = _mkdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert(
        "accounts", spark.createDataFrame([(4, "u4", 1.0)], "id long, name string, bal double")
    )
    t2.merge_upsert("audit", spark.createDataFrame([(9, "late")], "seq long, what string"))
    t1.commit()
    v = t2.commit()  # rebases over t1's commit, then lands
    pins = db.tables()
    assert pins == {"accounts": 1, "audit": 1}
    assert v == db._load()["current"]
    assert db.read("audit").count() == 2
    assert db.read("accounts").where("id = 4").count() == 1
    # nothing left to heal — both transactions are published
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_expensive_txn_survives_cheap_interleaved_commit(spark, tmp_path):
    """The round-6 verdict's arbitration scenario: a long/expensive
    transaction (multiple member-table commits) must not lose its work
    to a cheap interleaved commit on a disjoint table. Also pins the
    cost metadata: each published version records the transaction's
    copy-on-write cost."""
    db = _mkdb(spark, tmp_path)
    big = Transaction(db)
    big.__enter__()
    # expensive: two commits on accounts (cost accumulates)
    big.merge_upsert(
        "accounts", spark.createDataFrame([(10, "a", 1.0)], "id long, name string, bal double")
    )
    big.merge_upsert(
        "accounts", spark.createDataFrame([(11, "b", 2.0)], "id long, name string, bal double")
    )
    assert big.cost >= 2
    # cheap interleaved commit on the disjoint audit table
    cheap = Transaction(db)
    cheap.__enter__()
    cheap.merge_upsert("audit", spark.createDataFrame([(5, "x")], "seq long, what string"))
    cheap.commit()
    # the expensive transaction still commits (rebase, not cancel)
    big.commit()
    pins = db.tables()
    assert pins["accounts"] == 2 and pins["audit"] == 1
    assert db.read("accounts").where("id >= 10").count() == 2
    assert db.read("audit").count() == 2
    # costs are recorded in the published version entries
    m = db._load()
    costs = {int(v): e.get("cost") for v, e in m["versions"].items() if e["op"] == "txn"}
    assert costs[m["current"]] == big.cost >= 2


def test_same_table_conflict_cancels_with_costs(spark, tmp_path):
    """A genuine same-KEY conflict is NOT rebasable: the loser cancels
    with an error naming the cost (the OCC mapping of the reference's
    cancel-conflicted rule). Both sides upsert id 20 — disjoint-key
    same-table interleaves now rebase instead (Row-granular
    conflicts; see test_unpartitioned_disjoint_key_writers_both_commit)."""
    db = _mkdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert(
        "accounts", spark.createDataFrame([(20, "w", 1.0)], "id long, name string, bal double")
    )
    t1.commit()
    # t2 upserts the SAME KEY after t1 committed: the key hulls
    # overlap, so the re-executed commit is undone and t2 cancels
    with pytest.raises(ConcurrentWriteError, match="cost"):
        t2.merge_upsert(
            "accounts", spark.createDataFrame([(20, "l", 2.0)], "id long, name string, bal double")
        )


def test_live_inflight_txn_not_rolled_back_by_new_txn_start(spark, tmp_path):
    """Round-6 advice: Transaction.__enter__ used to run an
    unconditional recover(), cancelling any live in-flight writer.
    Now a diverged member table YOUNGER than the grace window is left
    alone at transaction start, so overlapping writers no longer
    livelock; explicit recover() still heals unconditionally."""
    db = _mkdb(spark, tmp_path)
    inflight = Transaction(db)
    inflight.__enter__()
    inflight.merge_upsert(
        "accounts", spark.createDataFrame([(30, "f", 3.0)], "id long, name string, bal double")
    )
    # a new transaction starts while the first is mid-flight: the
    # fresh accounts manifest must NOT be rolled back
    other = Transaction(db)
    other.__enter__()
    assert db.table("accounts")._load()["current"] == 1  # private version intact
    other.merge_upsert("audit", spark.createDataFrame([(7, "o")], "seq long, what string"))
    other.commit()
    inflight.commit()  # rebases over `other`, still lands
    assert db.tables() == {"accounts": 1, "audit": 1}
    # explicit recovery remains unconditional (and finds nothing now)
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_create_refuses_existing_database(spark, tmp_path):
    """create() on a path already holding a database must raise, not
    silently reset the pin history (round-6 advice)."""
    db = _mkdb(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        SnapshotDatabase.create(spark, db.path)


def test_db_time_travel_and_vacuum_keep_pinned(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    for k in (1, 2):
        with db.transaction() as t:
            t.update_where(
                "accounts", F.col("id") == 1, {"bal": F.col("bal") + F.lit(float(k))}
            )
    assert _bal(db)[1] == 103.0
    # time travel: version before both updates (db v2 = after create_table audit)
    assert _bal(db, db_version=2)[1] == 100.0
    rep = db.vacuum(keep_last=2)
    # old db versions dropped; reads of kept versions still work
    assert rep["dropped_db_versions"]
    assert _bal(db)[1] == 103.0
    assert _bal(db, db_version=3)[1] == 101.0
    with pytest.raises(ValueError):
        db.read("accounts", db_version=0)


def test_exception_in_block_abandons(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    pre = _bal(db)
    with pytest.raises(RuntimeError):
        with db.transaction() as t:
            t.delete_where("accounts", F.col("id") == 5)
            raise RuntimeError("app error mid-transaction")
    assert _bal(db) == pre  # delete not published
    SnapshotDatabase(spark, db.path).recover()
    assert db.table("accounts")._load()["current"] == 0


def test_database_txn_sink_multi_table_exactly_once(spark, tmp_path, sf_dir):
    """A micro-batch fans out to a fact table and a per-user aggregate
    through ONE atomic database commit: both visible together, batch
    replay no-ops, a crash between table commits is invisible."""
    from pyspark.sql import functions as F2

    from herodb_spark.catalog import load_table
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "purchases",
        spark.createDataFrame([], "event_id long, user_id long, value double"),
        key_cols=["event_id"],
    )
    db.create_table(
        "totals", spark.createDataFrame([], "user_id long, total double"), key_cols=["user_id"]
    )
    sink = DatabaseTxnSink(
        db,
        routes={
            "purchases": lambda b: b.select("event_id", "user_id", "value"),
            "totals": lambda b: b.groupBy("user_id").agg(
                F2.round(F2.sum(F2.col("value").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("total")
            ),
        },
        sink_id="pipe",
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F2.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
        .limit(50)
    )
    sink(ev, 0)
    assert db.last_txn("pipe") == 0
    assert db.read("purchases").count() == 50
    n_users = db.read("totals").count()
    assert n_users >= 1
    # both tables published by ONE db version
    assert db.history()[-1]["op"] == "txn"
    # replay of batch 0: no-op, same db version
    v = db._load()["current"]
    sink(ev, 0)
    assert db._load()["current"] == v
    # crash between table commits: apply a table mutation directly
    # (simulating a sink death after table A, before the swap)
    db.table("purchases").delete_where(F2.lit(True))
    assert db.read("purchases").count() == 50  # pin unchanged → invisible
    SnapshotDatabase(spark, db.path).recover()
    assert db.read("purchases").count() == 50
    # next batch proceeds normally after recovery
    sink(ev.withColumn("event_id", F2.col("event_id") + 1000000), 1)
    assert db.last_txn("pipe") == 1
    assert db.read("purchases").count() == 100


def test_database_txn_sink_empty_batch_advances_watermark(spark, tmp_path):
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "t", spark.createDataFrame([(1, 1.0)], "k long, v double"), key_cols=["k"]
    )
    sink = DatabaseTxnSink(db, routes={"t": lambda b: b}, sink_id="s")
    empty = spark.createDataFrame([], "k long, v double")
    sink(empty, 0)
    assert db.last_txn("s") == 0  # watermark advanced, no replay loop
    sink(empty, 0)  # replay no-ops
    assert db.last_txn("s") == 0


def test_database_txn_sink_through_writestream(spark, tmp_path, sf_dir):
    """End-to-end through Structured Streaming: the purchases stream
    fans out to a fact table and per-user totals via foreachBatch;
    after availableNow drains, both tables reconcile against the batch
    computation and every database version is a consistent pin set."""
    from pyspark.sql import functions as F2

    from herodb_spark.catalog import load_table
    from herodb_spark.streaming.ops import stream_events
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "purchases",
        spark.createDataFrame([], "event_id long, user_id long, value double"),
        key_cols=["event_id"],
    )
    db.create_table(
        "totals", spark.createDataFrame([], "user_id long, total double"), key_cols=["user_id"]
    )
    sink = DatabaseTxnSink(
        db,
        routes={
            "purchases": lambda b: b.select("event_id", "user_id", "value"),
            "totals": lambda b: b.groupBy("user_id").agg(
                F2.round(F2.sum(F2.col("value").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("total")
            ),
        },
        sink_id="pipe",
    )
    stream = (
        stream_events(spark, sf_dir)
        .where(F2.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = (
        load_table(spark, sf_dir, "events")
        .where(F2.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    assert db.read("purchases").count() == want.count()
    assert db.last_txn("pipe") >= 0
    # NOTE: per-batch totals MERGE replaces (not accumulates) a user's
    # total, so with multiple micro-batches the totals table holds the
    # LAST batch's aggregate per user — this test only asserts the
    # multi-table atomicity invariant on every published version:
    for h in db.history():
        if h["op"] != "txn":
            continue
        pins = h["tables"]
        assert set(pins) == {"purchases", "totals"}
    # exactly-once under replay: re-running the drained stream with the
    # same checkpoint produces no new database version
    v = db._load()["current"]
    q2 = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert db._load()["current"] == v


def test_database_scope_compact_publishes_pin(spark, tmp_path):
    """Database-scope compaction: fragmented member tables are
    compacted AND the compacted versions publish through the pin swap
    (a bare table-level compact would be invisible to db readers and
    rolled back by the next recovery). Content identical, db version
    advances, nothing left to heal."""
    db = _mkdb(spark, tmp_path)
    # fragment accounts: several single-row merges, many files
    for i in range(6):
        db.table("accounts")  # handle only
    for i in range(6):
        with db.transaction() as t:
            t.merge_upsert(
                "accounts",
                spark.createDataFrame(
                    [(50 + i, f"f{i}", float(i))], "id long, name string, bal double"
                ),
            )
    before = sorted(tuple(r) for r in db.read("accounts").collect())
    pin_before = db.tables()["accounts"]
    rep = db.compact(max_files_per_partition=1)
    assert "accounts" in rep and rep["accounts"]["files_after"] < rep["accounts"]["files_before"]
    pins = db.tables()
    assert pins["accounts"] == pin_before + 1  # compacted version pinned
    assert sorted(tuple(r) for r in db.read("accounts").collect()) == before
    assert SnapshotDatabase(spark, db.path).recover() == {}
    # no-op second pass: nothing fragmented, no new db version
    v = db._load()["current"]
    assert db.compact(max_files_per_partition=1) == {}
    assert db._load()["current"] == v


def test_sink_auto_compaction_bounds_files(spark, tmp_path):
    """DatabaseTxnSink(compact_every=2): after every 2nd committed
    batch the routed tables are compacted, so per-partition file
    counts stay bounded as batches accumulate."""
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "t", spark.createDataFrame([], "k long, v double"), key_cols=["k"]
    )
    sink = DatabaseTxnSink(
        db, routes={"t": lambda b: b}, sink_id="s", compact_every=2,
        max_files_per_partition=2,
    )
    for bid in range(4):
        batch = spark.createDataFrame(
            [(bid * 10 + j, float(j)) for j in range(8)], "k long, v double"
        ).repartition(4)  # several files per batch
        sink(batch, bid)
    assert db.last_txn("s") == 3
    m = db.table("t")._load()
    entry = m["versions"][str(m["current"])]
    assert entry["op"] == "compact"
    assert all(n <= 2 for n in entry["files"].values()), entry["files"]
    assert db.read("t").count() == 32


def test_sink_retention_vacuum_bounds_versions(spark, tmp_path):
    """DatabaseTxnSink(vacuum_every=2, vacuum_keep_last=2): the sink
    publishes one db version per batch; periodic vacuum keeps the
    version count bounded while the kept window (and every table
    version it pins) stays readable."""
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table("t", spark.createDataFrame([], "k long, v double"), key_cols=["k"])
    sink = DatabaseTxnSink(
        db, routes={"t": lambda b: b}, sink_id="s", vacuum_every=2, vacuum_keep_last=2
    )
    for bid in range(6):
        sink(spark.createDataFrame([(bid, float(bid))], "k long, v double"), bid)
    m = db._load()
    assert len(m["versions"]) <= 2
    assert db.last_txn("s") == 5  # watermark survives vacuum
    assert db.read("t").count() == 6
    # replay of the last batch still no-ops after vacuum
    v = m["current"]
    sink(spark.createDataFrame([(5, 5.0)], "k long, v double"), 5)
    assert db._load()["current"] == v


def test_serializable_isolation_cancels_on_any_interleave(spark, tmp_path):
    """isolation='serializable' disables rebasing: a DISJOINT
    interleaved commit cancels the transaction (the pre-arbitration
    first-committer-wins behavior, opt-in)."""
    db = _mkdb(spark, tmp_path)
    t1 = Transaction(db, isolation="serializable")
    t1.__enter__()
    t1.merge_upsert(
        "accounts", spark.createDataFrame([(40, "s", 1.0)], "id long, name string, bal double")
    )
    t2 = Transaction(db)
    t2.__enter__()
    t2.merge_upsert("audit", spark.createDataFrame([(8, "z")], "seq long, what string"))
    t2.commit()
    with pytest.raises(ConcurrentWriteError, match="serializable"):
        t1.commit()


def test_tracked_read_set_blocks_write_skew_rebase(spark, tmp_path):
    """Write-skew guard: a transaction that READ table X through
    t.read() must cancel — not rebase — when an interleaved commit
    changes X, even though its own writes are disjoint."""
    db = _mkdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    bal = {r.id: r.bal for r in t1.read("accounts").collect()}  # read set: accounts
    t1.merge_upsert(
        "audit",
        spark.createDataFrame([(77, f"sum={sum(bal.values())}")], "seq long, what string"),
    )
    # interleaved commit to the READ table
    t2 = Transaction(db)
    t2.__enter__()
    t2.merge_upsert(
        "accounts", spark.createDataFrame([(1, "u1", 0.0)], "id long, name string, bal double")
    )
    t2.commit()
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        t1.commit()
    # heal t1's orphaned audit version (its txn was cancelled), then
    # verify read-your-writes inside a fresh transaction
    assert SnapshotDatabase(spark, db.path).recover() == {"audit": 1}
    t3 = Transaction(db)
    t3.__enter__()
    t3.merge_upsert(
        "audit", spark.createDataFrame([(90, "mine")], "seq long, what string")
    )
    assert t3.read("audit").where("seq = 90").count() == 1
    t3.commit()


def test_apply_heartbeat_keeps_early_commits_live(spark, tmp_path):
    """Progress heartbeat: each _apply refreshes the mtimes of the
    transaction's earlier member commits, so a long multi-statement
    transaction's FIRST table is not healed as stale by a sibling's
    grace-window recovery while later statements are still running."""
    import os as _os
    import time as _time

    db = _mkdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t1.merge_upsert(
        "accounts", spark.createDataFrame([(60, "h", 1.0)], "id long, name string, bal double")
    )
    # simulate the accounts commit aging past the grace window
    mp = db.table("accounts")._manifest_path()
    old = _time.time() - Transaction.RECOVER_GRACE_S - 100
    _os.utime(mp, (old, old))
    # next statement commits audit — the heartbeat refreshes accounts
    t1.merge_upsert("audit", spark.createDataFrame([(61, "h")], "seq long, what string"))
    assert _time.time() - _os.path.getmtime(mp) < 60
    # a sibling transaction starting now must NOT heal accounts
    other = Transaction(db)
    other.__enter__()
    assert db.table("accounts")._load()["current"] == 1
    t1.commit()
    assert db.tables() == {"accounts": 1, "audit": 1}


def test_sink_maintenance_failure_does_not_kill_stream(spark, tmp_path):
    """A failing compaction/vacuum pass is swallowed and recorded —
    the committed batch stands and the sink keeps accepting batches."""
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table("t", spark.createDataFrame([], "k long, v double"), key_cols=["k"])
    sink = DatabaseTxnSink(db, routes={"t": lambda b: b}, sink_id="s", compact_every=1)
    boom = RuntimeError("storage hiccup")

    def bad_compact(*a, **kw):
        raise boom

    db.compact = bad_compact
    sink(spark.createDataFrame([(1, 1.0)], "k long, v double"), 0)  # must not raise
    assert db.last_txn("s") == 0
    assert sink.last_maintenance_error is boom
    sink(spark.createDataFrame([(2, 2.0)], "k long, v double"), 1)
    assert db.last_txn("s") == 1


# -- partition-granular same-table arbitration (round 8) -------------------
# Reference Lock.h:22-29 locks at Table/Page/Row granularity and
# Rewrite.md:9-13 submits the highest-cost transaction, rolling back
# all conflicted. The lakehouse mapping: per-version rewritten-
# partition sets decide sub-table conflicts; live commit intents
# (cost-stamped, heartbeated) decide who wins a same-table race.


def _mkpdb(spark, tmp_path):
    """Database with a PARTITIONED fact table (partition_col=part)."""
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "pdb"))
    facts = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(10)],
        "id long, part string, v double",
    )
    db.create_table("facts", facts, key_cols=["id"], partition_col="part")
    log = spark.createDataFrame([(0, "init")], "seq long, what string")
    db.create_table("audit", log, key_cols=["seq"])
    return db


def _facts_rows(spark, part, ids):
    return spark.createDataFrame(
        [(i, part, float(1000 + i)) for i in ids], "id long, part string, v double"
    )


def test_same_table_disjoint_partition_writers_both_commit(spark, tmp_path):
    """THE round-7 verdict's top task: two transactions upserting
    DIFFERENT partition values of ONE table must both commit — the
    second rebases by re-executing on top of the published first and
    the manifests prove the rewritten partition sets are disjoint."""
    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert("facts", _facts_rows(spark, "a", [101, 103]))
    t1.commit()
    # t2 entered BEFORE t1 published; its partition-b upsert finds the
    # table advanced, rebases (disjoint partitions) and lands
    t2.merge_upsert("facts", _facts_rows(spark, "b", [102, 104]))
    t2.commit()
    assert db.tables()["facts"] == 2
    got = {r.id for r in db.read("facts").where("id > 100").collect()}
    assert got == {101, 102, 103, 104}
    # history + CDC are consistent: both commits visible in order
    t = db.table("facts")
    ch = {(r.id, r._change) for r in t.read_changes(0).collect()}
    assert (101, "insert") in ch and (102, "insert") in ch
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_same_table_overlapping_partition_writers_cancel(spark, tmp_path):
    """Same race, SAME partition AND a genuine key clash (both sides
    upsert id 101): the second writer's re-executed commit is undone
    (rollback) and the transaction cancels naming the clashing
    partition — no orphan version survives. (Same-partition interleaves
    with provably DISJOINT keys now land — see the key-granular tests
    below — so this pins the cancel on the real Row-level conflict.)"""
    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert("facts", _facts_rows(spark, "a", [101]))
    t1.commit()
    with pytest.raises(ConcurrentWriteError, match="'a'"):
        t2.merge_upsert("facts", _facts_rows(spark, "a", [101]))
    # the losing commit was rolled back: table current == published pin
    assert db.table("facts")._load()["current"] == db.tables()["facts"] == 1
    assert db.read("facts").where("id = 101 and v = 1101").count() == 1  # t1's row


def test_same_partition_disjoint_key_writers_both_commit(spark, tmp_path):
    """Row-granular conflicts (Lock.h:22-27, the last granularity
    level): two transactions upserting DIFFERENT KEYS of the SAME
    partition both commit — the manifests' per-commit update-key
    hulls ([101,103] vs [105,107]) prove the key sets disjoint, and
    the re-executed merge carried the first writer's rows forward."""
    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert("facts", _facts_rows(spark, "a", [101, 103]))
    t1.commit()
    t2.merge_upsert("facts", _facts_rows(spark, "a", [105, 107]))
    t2.commit()
    got = {r.id for r in db.read("facts").where("id > 100").collect()}
    assert got == {101, 103, 105, 107}
    # both writers' rows live in partition 'a' with their own values
    vals = {r.id: r.v for r in db.read("facts").where("id > 100").collect()}
    assert vals == {101: 1101.0, 103: 1103.0, 105: 1105.0, 107: 1107.0}
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_same_partition_hull_overlap_cancels(spark, tmp_path):
    """Key hulls are [min, max] ranges, so a key INSIDE the other
    side's hull cancels even when the exact key sets are disjoint —
    the documented conservatism (ranges can only admit provably-safe
    interleaves, never excuse a possible clash)."""
    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert("facts", _facts_rows(spark, "a", [101, 105]))
    t1.commit()
    with pytest.raises(ConcurrentWriteError, match="'a'"):
        t2.merge_upsert("facts", _facts_rows(spark, "a", [103]))


def test_unpartitioned_disjoint_key_writers_both_commit(spark, tmp_path):
    """The Row level reaches below the single implicit partition of an
    UNPARTITIONED table too: disjoint-key upserts both land (r8 would
    fast-fail these), while unknown-key interleaves still cancel."""
    db = _mkdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert(
        "accounts",
        spark.createDataFrame([(20, "n20", 1.0)], "id long, name string, bal double"),
    )
    t1.commit()
    t2.merge_upsert(
        "accounts",
        spark.createDataFrame([(30, "n30", 2.0)], "id long, name string, bal double"),
    )
    t2.commit()
    bal = _bal(db)
    assert bal[20] == 1.0 and bal[30] == 2.0
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_partition_read_set_allows_disjoint_writer(spark, tmp_path):
    """Partition-granular read sets (Lock.h:29-38 Shared analog): a
    transaction that READ only partition 'a' (ranges-pruned through
    the zone maps) commits over an interleaved writer of partition
    'b'; the same read CANCELS when the writer touched 'a'."""
    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    seen = t1.read("facts", ranges={"part": ("a", "a")}).collect()
    assert all(r.part == "a" for r in seen)
    assert t1._read_sets["facts"] == [
        {"ranges": {"part": ("a", "a")}, "parts": {"a"}}
    ]
    t1.merge_upsert(
        "audit", spark.createDataFrame([(70, f"n={len(seen)}")], "seq long, what string")
    )
    # interleaved commit to partition 'b' of the READ table
    t2 = Transaction(db)
    t2.__enter__()
    t2.merge_upsert("facts", _facts_rows(spark, "b", [202]))
    t2.commit()
    t1.commit()  # read 'a' + wrote 'b' provably don't overlap
    assert db.read("facts").where("id = 202").count() == 1
    assert db.read("audit").where("seq = 70").count() == 1
    # ... and the overlapping shape still cancels
    t3 = Transaction(db)
    t3.__enter__()
    t3.read("facts", ranges={"part": ("a", "a")})
    t3.merge_upsert(
        "audit", spark.createDataFrame([(71, "x")], "seq long, what string")
    )
    t4 = Transaction(db)
    t4.__enter__()
    t4.merge_upsert("facts", _facts_rows(spark, "a", [203]))
    t4.commit()
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        t3.commit()
    SnapshotDatabase(spark, db.path).recover()


def test_predicate_mutation_vs_disjoint_upsert_both_commit(spark, tmp_path):
    """Key hulls for PREDICATE mutations (Lock.h:22-27 Row, the
    write-side completion): update_where/delete_where record the
    [min, max] key hulls of their matched rows, so an interleave with
    an upsert of provably-different keys in the SAME partition
    commits on both sides — and a hull overlap still cancels."""
    db = _mkpdb(spark, tmp_path)
    from pyspark.sql import functions as F

    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    # t1: predicate update over keys 1..9 of partition 'a'
    t1.update_where(
        "facts", (F.col("id") <= 9) & (F.col("part") == "a"), {"v": F.col("v") + 1000}
    )
    t1.commit()
    # t2: upsert keys 101/103 into the SAME partition — hulls
    # [1,9] vs [101,103] prove the row sets disjoint
    t2.merge_upsert("facts", _facts_rows(spark, "a", [101, 103]))
    t2.commit()
    vals = {r.id: r.v for r in db.read("facts").where("part = 'a'").collect()}
    assert vals[1] == 1001.0 and vals[9] == 1009.0  # the update landed
    assert vals[101] == 1101.0 and vals[103] == 1103.0  # the upsert landed
    assert SnapshotDatabase(spark, db.path).recover() == {}

    # reversed order: the predicate mutation re-executes ON TOP of a
    # published disjoint upsert and its matched-row hull exonerates it
    t3 = Transaction(db)
    t3.__enter__()
    t4 = Transaction(db)
    t4.__enter__()
    t3.merge_upsert("facts", _facts_rows(spark, "a", [105]))
    t3.commit()
    t4.delete_where("facts", (F.col("id") <= 3) & (F.col("part") == "a"))
    t4.commit()
    ids = {r.id for r in db.read("facts").where("part = 'a'").collect()}
    assert 105 in ids and 1 not in ids and 3 not in ids
    assert SnapshotDatabase(spark, db.path).recover() == {}

    # hull OVERLAP still cancels: an upsert of key 5 lands first, then
    # a predicate update whose matched hull [5..9] spans it
    t5 = Transaction(db)
    t5.__enter__()
    t6 = Transaction(db)
    t6.__enter__()
    t5.merge_upsert("facts", _facts_rows(spark, "a", [5]))
    t5.commit()
    with pytest.raises(ConcurrentWriteError):
        t6.update_where(
            "facts",
            (F.col("id").between(5, 9)) & (F.col("part") == "a"),
            {"v": F.lit(0.0)},
        )
        t6.commit()
    SnapshotDatabase(spark, db.path).recover()


def test_row_granular_read_set_same_partition_disjoint_writer(spark, tmp_path):
    """Row-granular READ sets (Lock.h:29-38 Shared at Row): a reader
    of keys [1..9] and a writer of keys [101..103] in the SAME
    partition both commit — the declared range vs the writer's
    recorded key hull proves the row sets disjoint — while a writer
    INSIDE the declared range still cancels (write skew stays red)."""
    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    seen = t1.read("facts", ranges={"id": (1, 9)}).collect()
    assert {r.id for r in seen} == set(range(1, 10))  # exact footprint
    t1.merge_upsert(
        "audit", spark.createDataFrame([(80, f"n={len(seen)}")], "seq long, what string")
    )
    t2 = Transaction(db)
    t2.__enter__()
    t2.merge_upsert("facts", _facts_rows(spark, "a", [101, 103]))  # same partition
    t2.commit()
    t1.commit()  # hull [101,103] provably outside declared [1,9]
    assert db.read("audit").where("seq = 80").count() == 1
    # ...and a writer inside the range cancels the reader
    t3 = Transaction(db)
    t3.__enter__()
    t3.read("facts", ranges={"id": (1, 9)})
    t3.merge_upsert(
        "audit", spark.createDataFrame([(81, "x")], "seq long, what string")
    )
    t4 = Transaction(db)
    t4.__enter__()
    t4.merge_upsert("facts", _facts_rows(spark, "a", [5]))
    t4.commit()
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        t3.commit()
    SnapshotDatabase(spark, db.path).recover()


def test_range_read_phantom_writers_cancel(spark, tmp_path):
    """Predicate-lock (next-key) protection for declared range reads:
    a transaction that read ranges={'id': (100, 200)} and SAW NOTHING
    must cancel when an interleaver commits a matching row — whether
    it CREATES a new partition or rewrites a previously zone-map-
    skipped one — and must still commit when the interleaved rows
    provably cannot match the range."""
    db = _mkpdb(spark, tmp_path)
    # (a) matching row lands in a NEW partition 'c' → cancel
    t1 = Transaction(db)
    t1.__enter__()
    assert t1.read("facts", ranges={"id": (100, 200)}).count() == 0
    t1.merge_upsert(
        "audit", spark.createDataFrame([(85, "none")], "seq long, what string")
    )
    t2 = Transaction(db)
    t2.__enter__()
    t2.merge_upsert("facts", _facts_rows(spark, "c", [150]))
    t2.commit()
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        t1.commit()
    SnapshotDatabase(spark, db.path).recover()

    # (b) matching row lands in a previously-SKIPPED partition → cancel
    t3 = Transaction(db)
    t3.__enter__()
    assert t3.read("facts", ranges={"id": (300, 400)}).count() == 0
    t3.merge_upsert(
        "audit", spark.createDataFrame([(86, "none")], "seq long, what string")
    )
    t4 = Transaction(db)
    t4.__enter__()
    t4.merge_upsert("facts", _facts_rows(spark, "a", [350]))  # existing partition
    t4.commit()
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        t3.commit()
    SnapshotDatabase(spark, db.path).recover()

    # (c) non-matching interleaves — new partition AND skipped
    # partition — are provably safe: the reader commits
    t5 = Transaction(db)
    t5.__enter__()
    assert t5.read("facts", ranges={"id": (5000, 6000)}).count() == 0
    t5.merge_upsert(
        "audit", spark.createDataFrame([(87, "none")], "seq long, what string")
    )
    t6 = Transaction(db)
    t6.__enter__()
    t6.merge_upsert("facts", _facts_rows(spark, "d", [999]))  # new partition, id < 5000
    t6.merge_upsert("facts", _facts_rows(spark, "b", [998]))  # skipped partition
    t6.commit()
    t5.commit()
    assert db.read("audit").where("seq = 87").count() == 1
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_range_read_phantom_writer_threaded(spark, tmp_path):
    """The threaded schedule of the phantom case (r10 verdict #6):
    the interleaver runs on ITS OWN THREAD and CREATES a matching
    partition strictly between the reader's declared-range read and
    the reader's commit — the reader must cancel exactly as in the
    sequential schedule. Control leg: a threaded writer whose rows
    provably cannot match the declared range lets the reader commit."""
    import threading as _th

    db = _mkpdb(spark, tmp_path)

    def _run_interleaver(part, ids, done):
        t = Transaction(db)
        t.__enter__()
        t.merge_upsert("facts", _facts_rows(spark, part, ids))
        t.commit()
        done.set()

    # (a) red: the thread lands a matching row in a NEW partition
    r1 = Transaction(db)
    r1.__enter__()
    assert r1.read("facts", ranges={"id": (100, 200)}).count() == 0
    r1.merge_upsert(
        "audit", spark.createDataFrame([(90, "none")], "seq long, what string")
    )
    done = _th.Event()
    th = _th.Thread(target=_run_interleaver, args=("pz", [150], done))
    th.start()
    th.join(timeout=120)
    assert done.is_set(), "interleaver thread did not commit"
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        r1.commit()
    SnapshotDatabase(spark, db.path).recover()

    # (b) green: the threaded writer's keys are provably outside the
    # declared range — the reader commits over it
    r2 = Transaction(db)
    r2.__enter__()
    assert r2.read("facts", ranges={"id": (7000, 8000)}).count() == 0
    r2.merge_upsert(
        "audit", spark.createDataFrame([(91, "none")], "seq long, what string")
    )
    done2 = _th.Event()
    th2 = _th.Thread(target=_run_interleaver, args=("py", [999], done2))
    th2.start()
    th2.join(timeout=120)
    assert done2.is_set()
    r2.commit()
    assert db.read("audit").where("seq = 91").count() == 1
    assert SnapshotDatabase(spark, db.path).recover() == {}


def test_cheap_committer_defers_to_live_expensive_txn(spark, tmp_path):
    """Cost arbitration, defer leg: a cheap transaction hitting a
    table held by a LIVE higher-cost transaction's private versions
    waits (commit intents name the costs), retries after the winner
    publishes, and lands via the partition-granular rebase."""
    import threading as _th
    import time as _time

    db = _mkpdb(spark, tmp_path)
    exp = Transaction(db)
    exp.__enter__()
    # two partition-a commits: cost accumulates in the live intent
    exp.merge_upsert("facts", _facts_rows(spark, "a", [201]))
    exp.merge_upsert("facts", _facts_rows(spark, "a", [203]))
    assert exp.cost >= 2
    cheap = Transaction(db)
    cheap.__enter__()
    published = _th.Event()

    def _publish():
        _time.sleep(1.0)
        exp.commit()
        published.set()

    th = _th.Thread(target=_publish)
    th.start()
    # cheap (cost 0) defers to the live cost-2 holder, then rebases
    # over its published commit — disjoint partitions, both land
    cheap.merge_upsert("facts", _facts_rows(spark, "b", [202]))
    th.join()
    assert published.is_set()  # the wait really happened before our apply
    cheap.commit()
    got = {r.id for r in db.read("facts").where("id > 200").collect()}
    assert got == {201, 202, 203}


def test_expensive_txn_rolls_back_cheap_same_table_holder(spark, tmp_path):
    """Cost arbitration, rollback leg (Rewrite.md:11-13 "submit the
    transaction of highest cost, rollback all conflicted"): a higher-
    cost transaction arriving at a table held by a cheaper live
    holder rolls the holder's private version back; the holder is
    fenced out at its next statement/commit."""
    db = _mkpdb(spark, tmp_path)
    cheap = Transaction(db)
    cheap.__enter__()
    cheap.merge_upsert("facts", _facts_rows(spark, "a", [301]))
    assert cheap.cost >= 1
    exp = Transaction(db)
    exp.__enter__()
    # accumulate cost on a disjoint table first (the 6-hour-job shape)
    exp.merge_upsert("audit", spark.createDataFrame([(1, "x")], "seq long, what string"))
    exp.merge_upsert("audit", spark.createDataFrame([(2, "y")], "seq long, what string"))
    assert exp.cost > cheap.cost
    exp.merge_upsert("facts", _facts_rows(spark, "a", [302]))  # heals cheap's hold
    exp.commit()
    # the cheap holder is fenced out: depending on whether the winner
    # already published, either the rolled-back fence or the pin-
    # overlap check cancels it — both name the conflict
    with pytest.raises(ConcurrentWriteError, match="rolled back|not rebasable"):
        cheap.commit()
    assert db.read("facts").where("id = 302").count() == 1
    assert db.read("facts").where("id = 301").count() == 0  # cheap's write gone


def test_crashed_intent_holder_healed_after_grace(spark, tmp_path):
    """Liveness under crash of the intent holder: once its intent AND
    manifest mtimes age past the grace window, a sibling arbitrating
    on the same table heals the leftovers and proceeds."""
    import time as _time

    db = _mkpdb(spark, tmp_path)
    dead = Transaction(db)
    dead.__enter__()
    dead.merge_upsert("facts", _facts_rows(spark, "a", [401]))
    # simulate the crash: kill the heartbeat, age intent + manifest
    dead._stop_heartbeat()
    old = _time.time() - Transaction.RECOVER_GRACE_S - 100
    os.utime(dead._intent_path(), (old, old))
    os.utime(db.table("facts")._manifest_path(), (old, old))
    t = Transaction(db)
    t.__enter__()
    t.merge_upsert("facts", _facts_rows(spark, "a", [402]))  # heals, proceeds
    t.commit()
    assert db.read("facts").where("id = 402").count() == 1
    assert db.read("facts").where("id = 401").count() == 0


def test_long_statement_intent_heartbeat_keeps_txn_live(spark, tmp_path):
    """r7 advice: a single statement running LONGER than the grace
    window used to get healed (the manifest mtime only ticked per
    _apply). The background intent heartbeat is now the liveness
    signal: with a stale member manifest but a fresh intent, a
    sibling's start-time recovery must leave the private version
    alone."""
    import time as _time

    db = _mkpdb(spark, tmp_path)
    t1 = Transaction(db)
    t1.__enter__()
    t1.merge_upsert("facts", _facts_rows(spark, "a", [501]))
    # the next statement takes hours: member manifest goes stale...
    old = _time.time() - Transaction.RECOVER_GRACE_S - 100
    os.utime(db.table("facts")._manifest_path(), (old, old))
    # ...but the intent file stays fresh (heartbeat thread)
    other = Transaction(db)
    other.__enter__()
    assert db.table("facts")._load()["current"] == 1  # NOT healed
    t1.commit()
    assert db.tables()["facts"] == 1


def test_heartbeat_errors_are_surfaced(spark, tmp_path):
    """r7 advice: utime failures must not vanish — they land on
    Transaction.heartbeat_errors (here: the intent file disappears
    under the background heartbeat thread)."""
    import time as _time

    db = _mkpdb(spark, tmp_path)
    t = Transaction(db)
    t.HEARTBEAT_S = 0.1  # instance override: tick fast for the test
    t.__enter__()
    os.unlink(t._intent_path())
    deadline = _time.time() + 10
    while not t.heartbeat_errors and _time.time() < deadline:
        _time.sleep(0.05)
    t._stop_heartbeat()
    assert t.heartbeat_errors and "heartbeat" in t.heartbeat_errors[0]


def test_many_disjoint_partition_writers_all_commit(spark, tmp_path):
    """Stress the round-8 arbitration end to end: N concurrent
    transactions (threads) each upsert a DIFFERENT partition value of
    one table. Arrival order is arbitrary — each writer defers to or
    rebases over the others — but every one must eventually commit
    and every partition's rows must land (the reference's queue-in-
    parallel/apply-serially shape, Rewrite.md:3-13)."""
    import threading as _th

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "sdb"))
    seed = spark.createDataFrame(
        [(i, f"p{i}", 0.0) for i in range(5)], "id long, part string, v double"
    )
    db.create_table("facts", seed, key_cols=["id"], partition_col="part")
    errors: list = []

    def writer(i: int):
        try:
            t = Transaction(db)
            t.ARBITRATION_WAIT_S = 120.0  # generous under test-box load
            with t:
                t.merge_upsert(
                    "facts",
                    spark.createDataFrame(
                        [(100 + i, f"p{i}", float(i))], "id long, part string, v double"
                    ),
                )
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((i, repr(e)))

    threads = [_th.Thread(target=writer, args=(i,)) for i in range(5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert errors == []
    got = sorted(r.id for r in db.read("facts").where("id >= 100").collect())
    assert got == [100, 101, 102, 103, 104]
    # nothing left dangling: every commit is published
    assert SnapshotDatabase(spark, db.path).recover() == {}
    # history is a linear chain of 5 txn versions
    ops = [h["op"] for h in db.history()]
    assert ops.count("txn") == 5


def test_cross_table_deadlock_resolves_by_cost(spark, tmp_path):
    """Rewrite.md: 'a transaction is canceled right away when ...
    deadlock happens and this transaction's cost is lower'. The
    hold-and-wait shape: cheap holds facts and wants accounts;
    expensive holds accounts and wants facts. The expensive side
    breaks the cycle immediately (heals the cheaper hold); the cheap
    side, deferring on accounts, is fenced once the winner publishes."""
    import threading as _th
    import time as _time

    db = _mkpdb(spark, tmp_path)
    cheap = Transaction(db)
    cheap.__enter__()
    cheap.merge_upsert("facts", _facts_rows(spark, "a", [801]))  # holds facts
    exp = Transaction(db)
    exp.__enter__()
    exp.merge_upsert("audit", spark.createDataFrame([(81, "x")], "seq long, what string"))
    exp.merge_upsert("audit", spark.createDataFrame([(82, "y")], "seq long, what string"))
    assert exp.cost > cheap.cost
    # expensive wants facts: heals the cheaper holder, no waiting
    exp.merge_upsert("facts", _facts_rows(spark, "b", [802]))

    def _publish():
        _time.sleep(1.0)
        exp.commit()

    th = _th.Thread(target=_publish)
    th.start()
    # cheap wants audit (held by the live higher-cost transaction):
    # defers, then is fenced when the winner publishes — its own
    # facts hold was already rolled back by the arbitration heal
    with pytest.raises(ConcurrentWriteError, match="rolled back|cancelling"):
        cheap.merge_upsert(
            "audit", spark.createDataFrame([(83, "z")], "seq long, what string")
        )
        cheap.commit()
    th.join()
    assert db.read("facts").where("id = 802").count() == 1
    assert db.read("facts").where("id = 801").count() == 0
    assert {r.seq for r in db.read("audit").collect()} >= {81, 82}


def test_random_schedule_two_writers_property(spark, tmp_path):
    """Property over randomized SEQUENTIAL schedules: two transactions
    write random partition sets of one table, with apply/commit steps
    interleaved randomly (apply always precedes its own commit).
    Invariants, for every schedule:
    - a COMMITTED transaction has all its rows in the final published
      state (no lost updates);
    - a CANCELLED transaction contributes no rows after recovery;
    - at least one of the two always commits;
    - DISJOINT partitions + second apply AFTER first commit ⇒ both
      commit (the publish is visible, so the second rebases);
      with both applies before either commit, the second applier
      defers on the live holder and times out by design — the
      threaded stress/defer tests cover the concurrent-publish case;
    - recovery finds nothing to heal afterwards."""
    import random

    parts = ["a", "b", "c", "d"]
    rng = random.Random(80)
    for trial in range(6):
        psets = [
            sorted(rng.sample(parts, rng.randint(1, 2))),
            sorted(rng.sample(parts, rng.randint(1, 2))),
        ]
        steps = [(0, "apply"), (0, "commit"), (1, "apply"), (1, "commit")]
        while True:  # random order keeping each txn's apply < commit
            rng.shuffle(steps)
            if steps.index((0, "apply")) < steps.index((0, "commit")) and steps.index(
                (1, "apply")
            ) < steps.index((1, "commit")):
                break
        db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), f"p{trial}"))
        seed = spark.createDataFrame(
            [(i, parts[i], 0.0) for i in range(4)], "id long, part string, v double"
        )
        db.create_table("t", seed, key_cols=["id"], partition_col="part")
        txns = [Transaction(db), Transaction(db)]
        for t in txns:
            t.ARBITRATION_WAIT_S = 2.0  # sequential schedule: a defer
            t.__enter__()  # on a live holder can only time out
        status = {0: "pending", 1: "pending"}
        base_id = [1000, 2000]
        for i, action in steps:
            if status[i] == "cancelled":
                continue
            try:
                if action == "apply":
                    rows = [
                        (base_id[i] + j, p, float(i)) for j, p in enumerate(psets[i])
                    ]
                    txns[i].merge_upsert(
                        "t",
                        spark.createDataFrame(rows, "id long, part string, v double"),
                    )
                    status[i] = "applied"
                else:
                    txns[i].commit()
                    status[i] = "committed"
            except ConcurrentWriteError:
                status[i] = "cancelled"
        for t in txns:
            t._stop_heartbeat()
        SnapshotDatabase(spark, db.path).recover()
        got = {r.id for r in db.read("t").collect()}
        desc = f"trial {trial}: psets={psets} steps={steps} status={status}"
        assert any(s == "committed" for s in status.values()), desc
        for i in (0, 1):
            want = {base_id[i] + j for j in range(len(psets[i]))}
            if status[i] == "committed":
                assert want <= got, desc
            else:
                assert not (want & got), desc
        disjoint = not (set(psets[0]) & set(psets[1]))
        serial = steps.index((0, "commit")) < steps.index((1, "apply")) or steps.index(
            (1, "commit")
        ) < steps.index((0, "apply"))
        if disjoint and serial:
            assert status == {0: "committed", 1: "committed"}, desc
        assert SnapshotDatabase(spark, db.path).recover() == {}, desc


def test_random_range_reader_vs_writer_property(spark, tmp_path):
    """Property over randomized reader-vs-writer schedules: a reader
    declares ranges={'id': (lo, hi)} and commits an audit row derived
    from what it saw; an interleaved writer upserts a random key set
    into a random partition (sometimes a NEW one — the phantom case).
    With long keys and merge_upserts, the machinery's proofs are the
    INTERVAL algebra of recorded key hulls, so the outcome is exactly
    the hull rule (the reference's range-lock granularity):

        reader commits  ⟺  [min(wkeys), max(wkeys)] ∩ [lo, hi] = ∅

    Safety (the ⇒ half every serializable engine needs): any actual
    writer key inside the range implies hull overlap implies cancel.
    The ⟸ half pins the exoneration: hull-disjoint writers commit on
    both sides — including into the SAME partition the reader
    resolved, a NEW partition, and a zone-map-skipped one. A
    non-contiguous key set straddling the range ({27, 77} vs
    [29, 30]) cancels by the documented hull conservatism."""
    import random

    rng = random.Random(101)
    parts = ["a", "b", "c"]
    for trial in range(8):
        lo = rng.randint(0, 40)
        hi = lo + rng.randint(0, 30)
        wkeys = sorted(rng.sample(range(0, 80), rng.randint(1, 3)))
        wpart = rng.choice(parts + ["z"])  # 'z' = partition that doesn't exist yet
        db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), f"r{trial}"))
        seed = spark.createDataFrame(
            [(i, parts[i % 3], 0.0) for i in range(0, 30, 2)],
            "id long, part string, v double",
        )
        db.create_table("t", seed, key_cols=["id"], partition_col="part")
        db.create_table(
            "audit",
            spark.createDataFrame([(0, 0)], "seq long, n long"),
            key_cols=["seq"],
        )
        reader = Transaction(db)
        reader.__enter__()
        seen = reader.read("t", ranges={"id": (lo, hi)}).count()
        reader.merge_upsert(
            "audit", spark.createDataFrame([(1, seen)], "seq long, n long")
        )
        writer = Transaction(db)
        writer.__enter__()
        writer.merge_upsert(
            "t",
            spark.createDataFrame(
                [(k, wpart, 9.0) for k in wkeys], "id long, part string, v double"
            ),
        )
        writer.commit()
        hull_overlaps = wkeys[0] <= hi and wkeys[-1] >= lo
        # the safety direction: a REAL in-range write must imply the
        # hull overlap the machinery cancels on
        assert (not any(lo <= k <= hi for k in wkeys)) or hull_overlaps
        desc = f"trial {trial}: range=({lo},{hi}) wkeys={wkeys} wpart={wpart}"
        if hull_overlaps:
            with pytest.raises(ConcurrentWriteError):
                reader.commit()
            reader._stop_heartbeat()
        else:
            reader.commit()
            assert db.read("audit").where("seq = 1").count() == 1, desc
        SnapshotDatabase(spark, db.path).recover()
        # the writer's rows always survive, whatever the reader did
        got = {r.id for r in db.read("t").where("v = 9.0").collect()}
        assert got == set(wkeys), desc


def test_snapshot_lifecycle_oracle(spark, sf_dir, duck):
    """The graded durable-layer query (round 10): three multi-table
    transactions + time travel + vacuum, hash-matched against the
    pure-SQL oracle over nation."""
    from herodb_spark.operators.lifecycle import (
        SNAPSHOT_LIFECYCLE_SQL,
        snapshot_lifecycle,
    )
    from tests.harness import compare

    res = compare(snapshot_lifecycle(spark, sf_dir), SNAPSHOT_LIFECYCLE_SQL, duck)
    assert res["ok"], res


def test_snapshot_maintenance_oracle(spark, sf_dir, duck):
    """The graded maintenance query (round 10): schema evolution +
    overwrite/rollback + z-order + pruned read, hash-matched against
    the pure-SQL oracle over nation."""
    from herodb_spark.operators.lifecycle import (
        SNAPSHOT_MAINTENANCE_SQL,
        snapshot_maintenance,
    )
    from tests.harness import compare

    res = compare(snapshot_maintenance(spark, sf_dir), SNAPSHOT_MAINTENANCE_SQL, duck)
    assert res["ok"], res


def test_vacuum_sweep_is_create_safe(spark, tmp_path):
    """Round-12 advice (database.py vacuum TOCTOU): the reclaim sweep
    renames candidates to hidden trash INSIDE the commit-lock critical
    section, and create_table publishes its staged directory under the
    SAME lock — so a sweep whose manifest snapshot predates a racing
    create can never delete the fresh directory. Pinned here:
    (a) drop → vacuum → recreate round-trip still works and the new
        table's data survives a second vacuum;
    (b) a young .stage- orphan (in-flight create) is NOT reclaimed;
        a backdated one (crashed create) IS;
    (c) the published create leaves no stage dir behind."""
    import time as _time

    db = _mkdb(spark, tmp_path)
    tables_dir = os.path.join(db.path, "tables")

    db.drop_table("audit")
    db.vacuum(keep_last=1)
    assert not os.path.exists(os.path.join(tables_dir, "audit"))

    fresh = spark.createDataFrame([(1, "new")], "seq long, what string")
    db.create_table("audit", fresh, key_cols=["seq"])
    # (c) staged dir was renamed into place, not copied
    assert [d for d in os.listdir(tables_dir) if d.startswith(".stage-")] == []

    # (b) orphan age-gating
    young = os.path.join(tables_dir, ".stage-young")
    old = os.path.join(tables_dir, ".stage-old")
    os.makedirs(young)
    os.makedirs(old)
    past = _time.time() - SnapshotDatabase.STAGE_ORPHAN_GRACE_S - 60
    os.utime(old, (past, past))
    rep = db.vacuum(keep_last=1)
    assert os.path.isdir(young)
    assert not os.path.exists(old)

    # (a) the re-created table survived the sweep (its name is live)
    assert "audit" not in rep["reclaimed_tables"]
    rows = db.read("audit").collect()
    assert [(r.seq, r.what) for r in rows] == [(1, "new")]
    os.rmdir(young)


def test_create_table_abort_cleans_stage(spark, tmp_path):
    """A create_table that loses its OCC commit (manifest advanced
    between read and commit) must leave neither a manifest pin nor a
    staged/published directory."""
    db = _mkdb(spark, tmp_path)
    tables_dir = os.path.join(db.path, "tables")
    orig_commit = db._mf._commit

    def racing_commit(m, **kw):
        # interleave a drop_table between create_table's read and commit
        SnapshotDatabase(spark, db.path).drop_table("audit")
        return orig_commit(m, **kw)

    db._mf._commit = racing_commit
    try:
        with pytest.raises(ConcurrentWriteError):
            db.create_table(
                "extra",
                spark.createDataFrame([(1,)], "x long"),
                key_cols=["x"],
            )
    finally:
        db._mf._commit = orig_commit
    assert not os.path.exists(os.path.join(tables_dir, "extra"))
    assert [d for d in os.listdir(tables_dir) if d.startswith(".stage-")] == []


# ---------------------------------------------------------- export bundle
# ("Generate the whole data base to C++", Kernel/README.md HIGH-LEVEL
# FEATURES — the self-contained reproducible artifact)


def test_export_import_bundle_roundtrip(spark, tmp_path):
    """export_bundle + import_bundle reproduce the database: content
    bit-identical, DDL (keys/partitioning/schema) carried, the program
    log embedded and surfaced on the import commit, and the imported
    database accepts new transactions + pruned reads."""
    import os

    from herodb_spark.sources.database import SnapshotDatabase

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "facts",
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(12)], "key long, grp long, val long"
        ),
        key_cols=["key"],
        partition_col="grp",
    )
    db.create_table(
        "audit",
        spark.createDataFrame([(0, "init")], "seq long, what string"),
        key_cols=["seq"],
    )
    with db.transaction() as t:
        t.merge_upsert(
            "facts",
            spark.createDataFrame([(100, 2, 7)], "key long, grp long, val long"),
            program="set facts(100, 2, 7);",
        )
    r = db.export_bundle(os.path.join(str(tmp_path), "bundle"))
    assert r["tables"] == ["audit", "facts"] and r["programs"] == 1
    db2 = SnapshotDatabase.import_bundle(
        spark, os.path.join(str(tmp_path), "bundle"), os.path.join(str(tmp_path), "db2")
    )
    for name in ("facts", "audit"):
        assert sorted(tuple(x) for x in db.read(name).collect()) == sorted(
            tuple(x) for x in db2.read(name).collect()
        )
    # DDL carried: keys + partitioning intact on the import
    tm = db2.table("facts")._load()
    assert tm["key_cols"] == ["key"] and tm["partition_col"] == "grp"
    # program log surfaced on the import commit
    assert "set facts(100, 2, 7);" in (db2.table("facts").history()[0]["program"] or "")
    # fully functional: new transaction + zone-map-pruned read
    with db2.transaction() as t:
        t.merge_upsert(
            "facts", spark.createDataFrame([(200, 1, 1)], "key long, grp long, val long")
        )
    assert db2.read("facts").where("key = 200").count() == 1
    got = db2.read("facts", ranges={"key": (0, 3)}).where("key between 0 and 3")
    assert got.count() == 4
    # refuses a populated destination
    with pytest.raises(ValueError, match="non-empty"):
        db.export_bundle(os.path.join(str(tmp_path), "bundle"))


def test_export_bundle_after_migration_carries_new_ddl(spark, tmp_path):
    """A bundle exported after a schema migration carries the MIGRATED
    definition (new key set included)."""
    import os

    from herodb_spark.sources.database import SnapshotDatabase

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "t", spark.createDataFrame([(1, 5)], "k long, v long"), key_cols=["k"]
    )
    with db.transaction() as txn:
        txn.migrate("t", {"kk": "CAST(k AS STRING)", "w": "v * 2"}, key_cols=["kk"])
    db.export_bundle(os.path.join(str(tmp_path), "b"))
    db2 = SnapshotDatabase.import_bundle(
        spark, os.path.join(str(tmp_path), "b"), os.path.join(str(tmp_path), "db2")
    )
    assert db2.table("t")._load()["key_cols"] == ["kk"]
    assert sorted(tuple(x) for x in db2.read("t").collect()) == [("1", 10)]


def test_export_bundle_pins_partitioning_as_of_db_pin(spark, tmp_path):
    """A STANDALONE table migrate (outside any database transaction)
    that changes the partition column must not relabel the exported
    data: the bundle carries the partitioning in effect AT the
    database-pinned version, and the import reads the pinned
    (pre-migration) content."""
    import os

    from herodb_spark.sources.database import SnapshotDatabase

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    db.create_table(
        "t",
        spark.createDataFrame(
            [(i, i % 2, i * 10) for i in range(6)], "k long, p long, v long"
        ),
        key_cols=["k"],
        partition_col="p",
    )
    with db.transaction() as txn:
        txn.merge_upsert("t", spark.createDataFrame([(9, 1, 90)], "k long, p long, v long"))
    pinned = sorted(tuple(x) for x in db.read("t").collect())
    # standalone migrate AFTER the db pin: repartition by v, rename p
    db.table("t").migrate(
        {"k": "k", "q": "p", "v": "v"}, key_cols=["k"], partition_col="v"
    )
    db.export_bundle(os.path.join(str(tmp_path), "b"))
    db2 = SnapshotDatabase.import_bundle(
        spark, os.path.join(str(tmp_path), "b"), os.path.join(str(tmp_path), "db2")
    )
    tm = db2.table("t")._load()
    assert tm["partition_col"] == "p"  # as-of-pin, not the migrated "v"
    assert tm["key_cols"] == ["k"]
    assert sorted(tuple(x) for x in db2.read("t").collect()) == pinned
