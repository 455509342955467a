"""Backup ring (Kernel/README.md HIGH-LEVEL FEATURES: "Auto Backup to
file group ring (maintain diff bitmaps for all file groups)") —
sources/backup.py. Load-bearing laws: diff-only copies (an unchanged
table costs zero copy work; a 1-partition mutation costs exactly its
rewritten directories — the copy counts pin this), N-slot rotation with
pool GC on wrap, crash-safe publish (a killed backup leaves the prior
ring intact), and restore producing a byte-equivalent, fully
functional database (content hash + time travel + post-restore
transaction)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from herodb_spark.sources.backup import BackupRing
from herodb_spark.sources.database import SnapshotDatabase
from herodb_spark.sources.snapshot import ConcurrentWriteError


def _mkdb(spark, tmp_path):
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    facts = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(12)], "key long, grp long, val long"
    )
    db.create_table("facts", facts, key_cols=["key"], partition_col="grp")
    db.create_table(
        "audit",
        spark.createDataFrame([(0, "init")], "seq long, what string"),
        key_cols=["seq"],
    )
    return db


def _content(db, spark):
    return sorted(tuple(r) for r in db.read("facts").collect()) + sorted(
        tuple(r) for r in db.read("audit").collect()
    )


def test_backup_restore_roundtrip_and_diff_economy(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    ring = BackupRing(os.path.join(str(tmp_path), "ring"), slots=3)

    r1 = ring.backup(db)
    assert r1["slot"] == 0 and r1["copied"] > 0 and r1["reused"] == 0
    before = _content(db, spark)

    # unchanged database: second backup copies NOTHING (the diff bitmap)
    r2 = ring.backup(db)
    assert r2["copied"] == 0 and r2["reused"] == r1["copied"] + r1["reused"]

    # one mutation touching exactly one partition: the next backup
    # copies exactly the rewritten directories (1 data dir here)
    with db.transaction() as t:
        t.merge_upsert(
            "facts", spark.createDataFrame([(100, 2, 7)], "key long, grp long, val long")
        )
    r3 = ring.backup(db)
    assert r3["copied"] == 1, r3

    # restore the PRE-mutation slot: byte-equivalent content, time
    # travel works, and the restored copy accepts new transactions
    dest = os.path.join(str(tmp_path), "restored")
    rdb = ring.open_restored(spark, 0, dest)
    assert _content(rdb, spark) == before
    assert rdb.read("facts", db_version=2).count() == 12  # time travel
    with rdb.transaction() as t:
        t.merge_upsert(
            "facts", spark.createDataFrame([(200, 0, 1)], "key long, grp long, val long")
        )
    assert rdb.read("facts").where("key = 200").count() == 1
    # the source database is untouched by the restored copy's writes
    assert db.read("facts").where("key = 200").count() == 0

    # restore the POST-mutation slot too
    rdb3 = ring.open_restored(spark, 2, os.path.join(str(tmp_path), "restored3"))
    assert rdb3.read("facts").where("key = 100").count() == 1


def test_ring_rotation_wraps_and_gcs(spark, tmp_path):
    """slots=2: the third backup overwrites slot 0; pool directories
    referenced ONLY by the evicted slot are reclaimed, shared ones
    survive."""
    db = _mkdb(spark, tmp_path)
    ring = BackupRing(os.path.join(str(tmp_path), "ring"), slots=2)
    ring.backup(db)  # slot 0: base
    with db.transaction() as t:
        t.update_where("facts", F.col("grp") == 0, {"val": F.lit(-1)})
    ring.backup(db)  # slot 1: base + v1 of grp 0
    with db.transaction() as t:
        t.update_where("facts", F.col("grp") == 0, {"val": F.lit(-2)})
    r3 = ring.backup(db)  # wraps to slot 0, evicting the base snapshot
    assert r3["slot"] == 0
    entries = ring.entries()
    assert sorted(entries) == [0, 1]
    # the evicted base's exclusive dir (grp-0 v0) is gone from the pool;
    # every dir referenced by the surviving slots is present
    live = {
        rel for e in entries.values() for rels in e.get("tables", {}).values() if False
    }
    m = ring._load()
    live = {
        (name, rel)
        for e in m["entries"].values()
        for name, rels in e["tables"].items()
        for rel in rels
    }
    pool = os.path.join(ring.path, "pool")
    on_disk = set()
    for name in os.listdir(pool):
        droot = os.path.join(pool, name, "data")
        if not os.path.isdir(droot):
            continue
        for vdir in os.listdir(droot):
            for leaf in os.listdir(os.path.join(droot, vdir)):
                if os.path.isdir(os.path.join(droot, vdir, leaf)):
                    on_disk.add((name, f"data/{vdir}/{leaf}"))
    assert on_disk == live, (on_disk - live, live - on_disk)
    # both surviving slots restore clean
    for slot in (0, 1):
        rdb = ring.open_restored(spark, slot, os.path.join(str(tmp_path), f"r{slot}"))
        assert rdb.read("facts").count() == 12


def test_backup_crash_safety_and_vacuum_race(spark, tmp_path, monkeypatch):
    """A backup killed mid-copy leaves the previous ring state intact
    (stage swept by the next backup); a directory vacuumed mid-backup
    raises ConcurrentWriteError instead of publishing a holey slot."""
    import shutil as _shutil

    db = _mkdb(spark, tmp_path)
    ring = BackupRing(os.path.join(str(tmp_path), "ring"), slots=2)
    ring.backup(db)
    state_before = ring._load()

    calls = {"n": 0}
    orig = _shutil.copytree

    def dying_copytree(src, dst, *a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash mid-copy")
        return orig(src, dst, *a, **kw)

    with db.transaction() as t:
        t.merge_upsert(
            "facts",
            spark.createDataFrame(
                [(300, 0, 1), (301, 1, 2)], "key long, grp long, val long"
            ),
        )
    monkeypatch.setattr("herodb_spark.sources.backup.shutil.copytree", dying_copytree)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ring.backup(db)
    monkeypatch.undo()
    assert ring._load() == state_before  # publish never happened
    # recovery: the crashed run's one COMPLETED pool copy is reusable
    # (content-addressed pool; unreferenced until a publish), so the
    # retry copies exactly the remaining new directory
    r = ring.backup(db)
    assert r["copied"] == 1, r
    t = db.table("facts")
    tm = t._load()
    some_rel = next(iter(tm["versions"][str(tm["current"])]["partitions"].values()))
    _shutil.rmtree(os.path.join(t.path, some_rel))
    # force a fresh pool so the missing dir must actually be read
    ring2 = BackupRing(os.path.join(str(tmp_path), "ring2"), slots=1)
    with pytest.raises(ConcurrentWriteError, match="vanished"):
        ring2.backup(db)


def test_auto_backup_through_txn_sink(spark, tmp_path):
    """'AUTO Backup to file group ring': DatabaseTxnSink(backup_every=2)
    rotates a ring slot after every 2nd committed batch — and the slot
    restores to exactly the post-batch state."""
    from herodb_spark.streaming.sink import DatabaseTxnSink

    db = _mkdb(spark, tmp_path)
    ring = BackupRing(os.path.join(str(tmp_path), "ring"), slots=2)
    sink = DatabaseTxnSink(
        db, routes={"facts": lambda b: b}, sink_id="s",
        backup_every=2, backup_ring=ring,
    )
    for i in range(4):
        sink(
            spark.createDataFrame([(500 + i, 0, i)], "key long, grp long, val long"),
            i,
        )
    entries = ring.entries()
    assert sorted(entries) == [0, 1]  # two auto-rotations (after b1, b3)
    # slot taken after batch 1 (db had keys 500, 501)
    first = min(entries.values(), key=lambda e: e["db_version"])
    slot = next(k for k, v in entries.items() if v is first)
    rdb = ring.open_restored(spark, slot, os.path.join(str(tmp_path), "r"))
    got = {r.key for r in rdb.read("facts").where("key >= 500").collect()}
    assert got == {500, 501}
    with pytest.raises(ValueError, match="come together"):
        DatabaseTxnSink(db, routes={}, backup_every=2)


def test_backup_detects_vacuumed_pinned_version(spark, tmp_path):
    """r12-advice medium: a db.vacuum racing between the db-manifest
    snapshot and the table-manifest read can prune a table VERSION the
    snapshotted db manifest pins while every partition directory
    survives (shared with newer versions) — the vanished-dir check
    never fires, but the restored database would raise 'no version N'.
    Backup must verify every pinned version resolves in the copied
    table manifest and raise the retriable error."""
    db = _mkdb(spark, tmp_path)
    with db.transaction() as t:
        t.merge_upsert(
            "facts",
            spark.createDataFrame([(500, 0, 5)], "key long, grp long, val long"),
        )
    # simulate the race's END STATE: the table manifest lost version 0
    # (which db-manifest version 1 pins) while all directories remain
    t = db.table("facts")
    tm = t._load()
    assert "0" in tm["versions"] and int(tm["current"]) > 0
    del tm["versions"]["0"]
    t._commit(tm)
    ring = BackupRing(os.path.join(str(tmp_path), "ring"), slots=2)
    with pytest.raises(ConcurrentWriteError, match="no longer resolvable"):
        ring.backup(db)
    # nothing was published
    assert ring.entries() == {}


def test_unpublished_slot_dir_is_swept(spark, tmp_path):
    """r12-advice low: a crash between os.rename(stage, final) and the
    ring-manifest write leaves a 'slot-N-<uuid>' directory no entry
    references; the stale sweep must reclaim it while leaving every
    REFERENCED slot directory alone."""
    db = _mkdb(spark, tmp_path)
    ring = BackupRing(os.path.join(str(tmp_path), "ring"), slots=2)
    ring.backup(db)
    live = {e["dir"] for e in ring._load()["entries"].values()}
    orphan = os.path.join(ring.path, "slot-1-deadbeef")
    os.makedirs(os.path.join(orphan, "tables"))
    ring.backup(db)
    names = set(os.listdir(ring.path))
    assert "slot-1-deadbeef" not in names
    assert live <= names  # previously published slots untouched
