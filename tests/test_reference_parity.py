"""1:1 parity with the reference's transaction-log unit suite
(Kernel/UnitTest/TestUtility_Log.cpp) plus the Lock suite's
registration case, re-expressed against the durable layer.

The reference's LogManager is the WAL half of its storage kernel:
transactions open, accumulate ordered LOG ITEMS (opaque payloads),
stay enumerable while ACTIVE, and remain enumerable INACTIVE after
close. In this engine the same observable surface is the
SnapshotDatabase transaction plus the persisted per-version PROGRAM
log (Rewrite.md:6 "save query to log"): statements are the items,
read-your-writes is the active enumeration, and history()'s program
texts are the inactive enumeration. Each test cites the reference
case it mirrors.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from herodb_spark.sources.database import SnapshotDatabase, Transaction


@pytest.fixture()
def db(spark, tmp_path):
    d = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    d.create_table(
        "facts",
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        key_cols=["k"],
    )
    d.create_table(
        "audit",
        spark.createDataFrame([], "seq long, what string"),
        key_cols=["seq"],
    )
    return d


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v long")


def test_transaction_with_no_item(spark, db):
    """TestUtility_Log.cpp:14 Utility_Log_TransactionWithNoItem — an
    opened transaction with zero items is valid, enumerates nothing,
    and closes cleanly. Here: an empty transaction block publishes NO
    database version and leaves every pin untouched."""
    before_ver = db._load()["current"]
    before_pins = db.tables()
    with db.transaction():
        pass
    assert db._load()["current"] == before_ver
    assert db.tables() == before_pins


def test_transaction_with_one_empty_item(spark, db):
    """TestUtility_Log.cpp:40 Utility_Log_TransactionWithOneEmptyItem
    — an item carrying zero bytes still closes. Here: a predicate
    mutation matching NOTHING is the empty item — the transaction
    completes, and (r10 convention) the no-op commits no version."""
    before = db.tables()
    with db.transaction() as t:
        t.delete_where("facts", F.col("v") == 9999)
    assert db.tables() == before
    assert db.read("facts").count() == 2


def test_transaction_with_one_non_empty_item(spark, db):
    """TestUtility_Log.cpp:84 Utility_Log_TransactionWithOneNonEmptyItem
    — the exact payload reads back both while the transaction is
    ACTIVE (EnumLogItem) and after close (EnumInactiveLogItem). Here:
    read-your-writes inside the block, then the persisted program
    text roundtrips byte-exactly through the manifest."""
    payload = "set Facts(3, 30); -- Vczh is genius!"
    t = Transaction(db)
    t.__enter__()
    t.merge_upsert("facts", _rows(spark, [(3, 30)]), program=payload)
    # active enumeration: the transaction sees its own item
    assert t.read("facts").where("k = 3").count() == 1
    # ...and nobody else does (the log item is still active-private)
    assert db.read("facts").where("k = 3").count() == 0
    t.commit()
    # inactive enumeration: exact payload in the program log
    progs = [h.get("program") for h in db.table("facts").history()]
    assert payload in progs
    assert db.read("facts").where("k = 3").count() == 1


def test_transaction_with_multiple_items(spark, db):
    """TestUtility_Log.cpp:133 Utility_Log_TransactionWithMultipleItems
    — several items in one transaction enumerate in WRITE ORDER.
    Here: three statements in one transaction; the member-table
    version log carries their programs in commit order and the final
    state composes all three."""
    items = ["item-1: upsert", "item-2: update", "item-3: delete"]
    with db.transaction() as t:
        t.merge_upsert("facts", _rows(spark, [(4, 40), (5, 50)]), program=items[0])
        t.update_where("facts", F.col("k") == 4, {"v": F.lit(41)}, program=items[1])
        t.delete_where("facts", F.col("k") == 5, program=items[2])
    progs = [h.get("program") for h in db.table("facts").history() if h.get("program")]
    assert progs == items  # write order preserved
    got = {r.k: r.v for r in db.read("facts").collect()}
    assert got[4] == 41 and 5 not in got


def test_open_transactions_sequential(spark, db):
    """TestUtility_Log.cpp:197 Utility_Log_OpenTransactionsSequencial
    — many transactions, many items each; every item stays
    attributed to ITS transaction in order (scaled: 4 txns × 3
    items). Here: each transaction's statements land as consecutive
    program entries of the versions that transaction published, and
    the database history has exactly one txn version per
    transaction."""
    n_txn, n_items = 4, 3
    hist_before = len(db.history())
    for i in range(n_txn):
        with db.transaction() as t:
            for j in range(n_items):
                t.merge_upsert(
                    "facts",
                    _rows(spark, [(100 + i * 10 + j, i)]),
                    program=f"Transaction<{i + 1}>: This is the {j + 1}-th message.",
                )
    assert len(db.history()) - hist_before == n_txn
    progs = [h.get("program") for h in db.table("facts").history() if h.get("program")]
    want = [
        f"Transaction<{i + 1}>: This is the {j + 1}-th message."
        for i in range(n_txn)
        for j in range(n_items)
    ]
    assert progs == want


def test_open_transactions_parallel(spark, db):
    """TestUtility_Log.cpp:273 Utility_Log_OpenTransactionsParallel —
    two transactions hold items CONCURRENTLY; each stream stays
    isolated and both close. Here: two interleaved transactions on
    DISJOINT tables both commit (the Lock.h Table-granularity
    admit), each table's program log carrying only its own items."""
    t1 = Transaction(db)
    t1.__enter__()
    t2 = Transaction(db)
    t2.__enter__()
    t1.merge_upsert("facts", _rows(spark, [(7, 70)]), program="t1: facts item")
    t2.merge_upsert(
        "audit",
        spark.createDataFrame([(1, "t2")], "seq long, what string"),
        program="t2: audit item",
    )
    t1.commit()
    t2.commit()
    f_progs = [h.get("program") for h in db.table("facts").history() if h.get("program")]
    a_progs = [h.get("program") for h in db.table("audit").history() if h.get("program")]
    assert f_progs[-1] == "t1: facts item" and "t2: audit item" not in f_progs
    assert a_progs[-1] == "t2: audit item" and "t1: facts item" not in a_progs
    assert db.read("facts").where("k = 7").count() == 1
    assert db.read("audit").count() == 1


def test_long_item(spark, db):
    """TestUtility_Log.cpp:354 Utility_Log_LongItem — a payload far
    larger than one page roundtrips exactly. Here: a ~300 KB program
    text (≫ the reference's 4 KB pages) survives the manifest
    write/read byte-identically."""
    payload = "x" * 300_000 + "-END"
    with db.transaction() as t:
        t.merge_upsert("facts", _rows(spark, [(8, 80)]), program=payload)
    progs = [h.get("program") for h in db.table("facts").history()]
    assert payload in progs


def test_lock_registering(spark, db):
    """TestUtility_Lock.cpp:27 Utility_Lock_Registering — acquiring a
    lock on an unregistered table/transaction is rejected. Here:
    reading or mutating a table the database never registered raises
    a clean error (not a silent create)."""
    with pytest.raises(ValueError, match="no table 'ghost_table'"):
        db.read("ghost_table")
    with pytest.raises(ValueError, match="no table 'ghost_table'"):
        with db.transaction() as t:
            t.merge_upsert("ghost_table", _rows(spark, [(1, 1)]))


# ---------------------------------------------------------------------------
# TestUtility_Lock.cpp — the S/X compatibility matrix at Table/Page/Row
# granularity, queued-transaction picking, and deadlock, mapped onto the
# OCC layer: "blocked" = cancel-on-validate, "compatible" = both commit.
# ---------------------------------------------------------------------------


def test_lock_table_granularity(spark, db):
    """TestUtility_Lock.cpp:201 Utility_Lock_Table — at TABLE
    granularity: S+S compatible (two whole-table readers both
    commit), S+X incompatible on the SAME table (a whole-table
    reader cancels when an interleaver writes it), unrelated tables
    never conflict (covered by test_open_transactions_parallel)."""
    from herodb_spark.sources.database import ConcurrentWriteError

    # S + S: both read facts concurrently, each writing its OWN
    # report table — shared reads never conflict, both commit
    db.create_table(
        "audit2", spark.createDataFrame([], "seq long, what string"), key_cols=["seq"]
    )
    with db.transaction() as t1:
        n1 = t1.read("facts").count()
        t1.merge_upsert(
            "audit", spark.createDataFrame([(10, f"n={n1}")], "seq long, what string")
        )
        with db.transaction() as t2:
            n2 = t2.read("facts").count()
            t2.merge_upsert(
                "audit2", spark.createDataFrame([(11, f"n={n2}")], "seq long, what string")
            )
    assert db.read("audit").where("seq = 10").count() == 1
    assert db.read("audit2").where("seq = 11").count() == 1
    # S + X on the same table: the reader must cancel
    tr = Transaction(db)
    tr.__enter__()
    tr.read("facts")  # whole-table Shared
    tr.merge_upsert(
        "audit", spark.createDataFrame([(12, "x")], "seq long, what string")
    )
    with db.transaction() as tw:
        tw.merge_upsert("facts", _rows(spark, [(50, 500)]))  # X on facts
    with pytest.raises(ConcurrentWriteError, match="read/write set"):
        tr.commit()
    SnapshotDatabase(spark, db.path).recover()


@pytest.fixture()
def pdb(spark, tmp_path):
    d = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "pdb"))
    d.create_table(
        "facts",
        spark.createDataFrame(
            [(i, "a" if i < 50 else "b", i) for i in range(0, 100, 10)],
            "id long, part string, v long",
        ),
        key_cols=["id"],
        partition_col="part",
    )
    return d


def _prow(spark, part, ids):
    return spark.createDataFrame(
        [(i, part, i) for i in ids], "id long, part string, v long"
    )


def test_lock_page_granularity(spark, pdb):
    """TestUtility_Lock.cpp:233 Utility_Lock_Page — at PAGE
    (partition) granularity: X+X on DIFFERENT partitions of one
    table both commit; X+X on the SAME rows cancels."""
    from herodb_spark.sources.database import ConcurrentWriteError

    # both enter before either publishes; the second rebases on the
    # PUBLISHED first (disjoint partition sets proven by manifests)
    t1 = Transaction(pdb)
    t1.__enter__()
    t2 = Transaction(pdb)
    t2.__enter__()
    t1.merge_upsert("facts", _prow(spark, "a", [1]))
    t1.commit()
    t2.merge_upsert("facts", _prow(spark, "b", [51]))  # other partition
    t2.commit()
    got = {r.id for r in pdb.read("facts").collect()}
    assert {1, 51} <= got
    # same rows: the loser cancels, the report naming the clashing
    # partition (the reference's blocked-on-same-target case)
    t3 = Transaction(pdb)
    t3.__enter__()
    t4 = Transaction(pdb)
    t4.__enter__()
    t3.merge_upsert("facts", _prow(spark, "a", [2]))
    t3.commit()
    with pytest.raises(ConcurrentWriteError, match="'a'"):
        t4.merge_upsert("facts", _prow(spark, "a", [2]))
    SnapshotDatabase(spark, pdb.path).recover()


def test_lock_row_granularity(spark, pdb):
    """TestUtility_Lock.cpp:267 Utility_Lock_Row — at ROW granularity:
    X+X on DISJOINT key ranges of the SAME partition both commit
    (recorded key hulls prove the rows distinct); the same-key case
    is the cancel half of test_lock_page_granularity."""
    t1 = Transaction(pdb)
    t1.__enter__()
    t2 = Transaction(pdb)
    t2.__enter__()
    t1.merge_upsert("facts", _prow(spark, "a", [3, 4]))
    t1.commit()
    # hulls [3,4] vs [41,42] in the SAME partition provably disjoint
    t2.merge_upsert("facts", _prow(spark, "a", [41, 42]))
    t2.commit()
    got = {r.id for r in pdb.read("facts").collect()}
    assert {3, 4, 41, 42} <= got


def test_lock_pick_transaction_and_deadlock_info(spark, pdb):
    """TestUtility_Lock.cpp:304/377/427 Utility_Lock_PickTransaction +
    SimpleDeadlock + MinimizedDeadlockInfo — among conflicting
    transactions the HIGHEST-IMPORTANCE one proceeds (here: cost),
    and the losing side's error carries the MINIMAL conflict info —
    its own cost and the winner's — not unrelated transactions."""
    from herodb_spark.sources.database import ConcurrentWriteError

    pdb.create_table(
        "audit", spark.createDataFrame([], "seq long, what string"), key_cols=["seq"]
    )
    cheap = Transaction(pdb)
    cheap.__enter__()
    cheap.merge_upsert("facts", _prow(spark, "a", [5]))  # holds facts, cost 1
    exp = Transaction(pdb)
    exp.__enter__()
    exp.merge_upsert(
        "audit", spark.createDataFrame([(1, "x")], "seq long, what string")
    )
    exp.merge_upsert(
        "audit", spark.createDataFrame([(2, "y")], "seq long, what string")
    )
    assert exp.cost > cheap.cost
    # the expensive side wants the cheap side's table: arbitration
    # picks the higher cost and rolls the cheaper holder back
    exp.merge_upsert("facts", _prow(spark, "a", [6]))
    exp.commit()
    with pytest.raises(ConcurrentWriteError) as ei:
        cheap.commit()
    msg = str(ei.value)
    assert "cost" in msg  # minimized info: the conflict's costs, named
    got = {r.id for r in pdb.read("facts").collect()}
    assert 6 in got and 5 not in got
    assert pdb.read("audit").count() == 2
    SnapshotDatabase(spark, pdb.path).recover()


# ---------------------------------------------------------------------------
# TestUtility_Buffer.cpp — the reference's paged-buffer-manager suite,
# mapped onto the snapshot storage layer: buffer SOURCES ↔ database
# member tables, PAGES ↔ version-scoped partition data directories,
# the page CACHE ↔ Spark's scan (content must read back exactly no
# matter what is "resident"), USE MASKS ↔ the manifest's per-partition
# file bookkeeping, the FREE-PAGE list ↔ vacuum GC + name/dir reuse.
# SURVEY §1 argues page-buffer MECHANICS are Spark's job; these cases
# mirror the suite's OBSERVABLE contracts 1:1 against our layer.
# ---------------------------------------------------------------------------

from herodb_spark.sources.snapshot import ConcurrentWriteError, SnapshotTable


def test_buffer_add_remove_source(spark, tmp_path):
    """TestUtility_Buffer.cpp:16 Utility_Buffer_AddRemoveSource — load
    a memory source and a file source (names resolve), unload both
    (names resolve empty), then load both AGAIN successfully. Here:
    create an unpartitioned and a partitioned member table (the two
    source kinds), drop both (reads fail, pin set empty), vacuum
    reclaims the directories, and both names re-create cleanly."""
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "bm"))
    db.create_table("mem_src", spark.createDataFrame([(1, 10)], "k long, v long"), key_cols=["k"])
    db.create_table(
        "file_src",
        spark.createDataFrame([(1, "a", 10)], "id long, part string, v long"),
        key_cols=["id"],
        partition_col="part",
    )
    assert set(db.tables()) == {"mem_src", "file_src"}  # GetSourceFileName resolves
    db.drop_table("mem_src")
    db.drop_table("file_src")
    assert db.tables() == {}  # UnloadSource: names resolve empty
    for name in ("mem_src", "file_src"):
        with pytest.raises(ValueError, match="no table"):
            db.read(name)
    # the dropped directory is still HELD until GC: re-creation refuses
    with pytest.raises(ValueError, match="vacuum"):
        db.create_table("mem_src", spark.createDataFrame([(2, 20)], "k long, v long"), key_cols=["k"])
    rep = db.vacuum(keep_last=1)
    assert set(rep["reclaimed_tables"]) == {"mem_src", "file_src"}
    # LoadMemorySource/LoadFileSource again — both succeed
    db.create_table("mem_src", spark.createDataFrame([(2, 20)], "k long, v long"), key_cols=["k"])
    db.create_table(
        "file_src",
        spark.createDataFrame([(2, "b", 20)], "id long, part string, v long"),
        key_cols=["id"],
        partition_col="part",
    )
    assert {r.k for r in db.read("mem_src").collect()} == {2}
    assert {r.id for r in db.read("file_src").collect()} == {2}


@pytest.mark.parametrize("partitioned", [False, True], ids=["InMemory", "File"])
def test_buffer_lock_unlock_page(spark, tmp_path, partitioned):
    """TestUtility_Buffer.cpp:55 Utility_Buffer_LockUnlockPage (run
    against BOTH source kinds via TEST_CASE_SOURCE:39, mirrored by the
    partitioned/unpartitioned parametrization) — lock a page, write,
    unlock persists exactly; UnlockPage with a WRONG ADDRESS fails;
    after FreePage the page can no longer be locked. Here: a committed
    version reads back exactly (lock→write→unlock); an OCC commit
    holding a STALE token raises without changing state (the wrong-
    address reject); vacuum frees the old version, after which time
    travel to it raises (lock-after-free), and a second vacuum drops
    nothing more (the double-free reject)."""
    if partitioned:
        df = spark.createDataFrame([(1, "a", 10)], "k long, part string, v long")
        t = SnapshotTable.create(
            spark, os.path.join(str(tmp_path), "t"), df, key_cols=["k"], partition_col="part"
        )
        upd = spark.createDataFrame([(2, "a", 20)], "k long, part string, v long")
    else:
        df = spark.createDataFrame([(1, 10)], "k long, v long")
        t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "t"), df, key_cols=["k"])
        upd = spark.createDataFrame([(2, 20)], "k long, v long")
    v1 = t.merge_upsert(upd)
    assert {r.k for r in t.read(version=v1).collect()} == {1, 2}  # unlock persisted
    # wrong address: a commit presenting a token the manager never
    # handed out for the current state must be rejected, state intact
    m = t._load()
    with pytest.raises(ConcurrentWriteError, match="advanced past"):
        t._commit(dict(m), expected_current=v1 - 1, expected_seq=0)
    assert t._load()["current"] == v1
    # FreePage: vacuum drops version 0; locking it afterwards fails
    rep = t.vacuum(keep_last=1)
    assert rep["dropped_versions"] == [0]
    with pytest.raises(ValueError, match="no version 0"):
        t.read(version=0)
    # double free: nothing further to drop
    assert t.vacuum(keep_last=1)["dropped_versions"] == []


def test_buffer_allocate_free_page(spark, tmp_path):
    """TestUtility_Buffer.cpp:75 Utility_Buffer_AllocateFreePage — the
    INDEX page exists up front and can never be freed; two fresh pages
    are distinct from it and each other; freeing page1 makes it
    unlockable while page2's content ("This is page 2") survives;
    the next allocation REUSES page1's slot (page3 == page1) and both
    contents read back exactly. Here: the database manifest is the
    index page (vacuum always keeps the current version); tables are
    the pages; drop+vacuum frees; create_table after reclaim reuses
    the same name/directory."""
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "bm"))
    db.create_table("page1", spark.createDataFrame([(1, "This is page 1")], "k long, v string"), key_cols=["k"])
    db.create_table("page2", spark.createDataFrame([(1, "This is page 2")], "k long, v string"), key_cols=["k"])
    assert set(db.tables()) == {"page1", "page2"}  # distinct, valid
    # the index page cannot be freed: the manifest survives any vacuum
    db.vacuum(keep_last=1)
    assert db._load()["current"] >= 0 and set(db.tables()) == {"page1", "page2"}
    # free page1; page2 content untouched
    db.drop_table("page1")
    db.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="no table"):
        db.read("page1")  # LockPage(page1) == nullptr
    assert db.read("page2").collect()[0].v == "This is page 2"
    # page3 == page1: same name and directory slot, fresh content
    p1_dir = db._table_path("page1")
    assert not os.path.exists(p1_dir)
    db.create_table("page1", spark.createDataFrame([(1, "This is page 3")], "k long, v string"), key_cols=["k"])
    assert os.path.exists(p1_dir)
    assert db.read("page1").collect()[0].v == "This is page 3"
    assert db.read("page2").collect()[0].v == "This is page 2"


def test_buffer_allocate_and_swap(spark, tmp_path):
    """TestUtility_Buffer.cpp:136 Utility_Buffer_AllocateAndSwap — 16
    pages across TWO file sources against an 8-page cache: every
    write/read forces swaps, yet all 32 payloads read back exactly,
    and the cached-page count never exceeds the cache bound
    (TEST_ASSERT_CACHE:131). Here (scaled 8×2): interleaved upserts
    into two partitions of one table pile up versions; compact()
    re-links files mid-stream and at the end (the swap/evict analog —
    storage relocates, content must not); the file-count bound after
    each compact is the cache-bound assert, and every payload reads
    back byte-exact."""
    rounds = 8
    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "t"),
        spark.createDataFrame([], "k long, part string, v string"),
        key_cols=["k"],
        partition_col="part",
    )
    max_files = 4
    for i in range(rounds):
        for j, src in enumerate(("db1.bin", "db2.bin")):
            t.merge_upsert(
                spark.createDataFrame(
                    [(i * 2 + j, src, f"{src} {i + 1}")], "k long, part string, v string"
                )
            )
        if i % 4 == 3:  # the swap: relocate storage, preserve content
            t.compact(max_files_per_partition=max_files)
            m = t._load()
            files = m["versions"][str(m["current"])]["files"]
            assert all(n <= max_files for n in files.values()), files  # TEST_ASSERT_CACHE
    got = {(r.k, r.part): r.v for r in t.read().collect()}
    assert len(got) == rounds * 2
    for i in range(rounds):
        for j, src in enumerate(("db1.bin", "db2.bin")):
            assert got[(i * 2 + j, src)] == f"{src} {i + 1}"


def test_buffer_file_use_masks(spark, tmp_path):
    """TestUtility_Buffer.cpp:182 Utility_Buffer_FileUseMasks — use
    bits at page indices (including the 1023/1024 and 32767/32768
    mask-page boundaries) set, clear, and re-set independently, and
    reads reflect exactly the bits written. Here: the manifest's
    per-version partition map IS the use mask — partitions named
    after the reference's boundary indices are marked used by writes
    and cleared by partition-emptying deletes; each version's mask
    reads back exactly, independently per partition, with file counts
    matching the directories on disk (totalUsedPages bookkeeping)."""
    from pyspark.sql import functions as F

    def mask(t, version=None):
        m = t._load()
        v = m["current"] if version is None else version
        return set(m["versions"][str(v)]["partitions"])

    t = SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "t"),
        spark.createDataFrame([(0, "p1023", 0)], "k long, part string, v long"),
        key_cols=["k"],
        partition_col="part",
    )
    # GetUseMask(1023)==F GetUseMask(1024)==F on untouched indices: only
    # the created partition is set
    assert mask(t) == {"p1023"}
    # SetUseMask(1024, true); SetUseMask(32768, true)
    t.merge_upsert(spark.createDataFrame([(1, "p1024", 1), (2, "p32768", 2)], "k long, part string, v long"))
    assert mask(t) == {"p1023", "p1024", "p32768"}
    # clear 1024/32768, set 32767 — bits move independently
    t.delete_where(F.col("part").isin("p1024", "p32768"))
    t.merge_upsert(spark.createDataFrame([(3, "p32767", 3)], "k long, part string, v long"))
    assert mask(t) == {"p1023", "p32767"}
    # every version's mask is exactly what was written at that version
    assert mask(t, 0) == {"p1023"}
    assert mask(t, 1) == {"p1023", "p1024", "p32768"}
    # file bookkeeping matches the directories on disk per partition
    m = t._load()
    cur = m["versions"][str(m["current"])]
    for pv, rel in cur["partitions"].items():
        n_disk = sum(
            1 for f in os.listdir(os.path.join(t.path, rel)) if f.endswith(".parquet")
        )
        assert cur["files"][pv] == n_disk, pv
    # clear everything: the final mask is empty (totalUsedPages == 0)
    t.delete_where(F.lit(True))
    assert mask(t) == set()
    assert t.read().count() == 0


def test_buffer_file_free_pages(spark, tmp_path):
    """TestUtility_Buffer.cpp:228 Utility_Buffer_FileFreePages — push
    1024 pages onto the free list, pop them ALL back, then push and
    pop the whole set AGAIN: the free list drains fully and behaves
    identically on the second cycle (no state leaks). Here (scaled
    N=3): two full create→drop→vacuum-reclaim→re-create cycles over
    the same table names; the reclaim set is identical each cycle and
    every name is reusable afterwards — GC keeps no hidden state."""
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "bm"))
    names = [f"pg{i}" for i in range(3)]
    for cycle in (1, 2):
        for i, name in enumerate(names):
            db.create_table(
                name,
                spark.createDataFrame([(i, cycle)], "k long, v long"),
                key_cols=["k"],
            )
        assert set(db.tables()) == set(names)
        assert {r.v for r in db.read("pg0").collect()} == {cycle}
        for name in names:
            db.drop_table(name)
        rep = db.vacuum(keep_last=1)
        assert set(rep["reclaimed_tables"]) == set(names), cycle  # full drain
        assert db.tables() == {}


def test_buffer_ddl_concurrency_stress(spark, tmp_path):
    """Threaded stress over the new DDL surface (the concurrency
    shape TestUtility_Buffer's manager runs under): three workers
    loop create→write→drop on THEIR OWN table names while a fourth
    interleaves database vacuums; the only admissible failures are
    the documented arbitration/DDL errors (ConcurrentWriteError,
    'no table', 'vacuum() before re-creating', 'already exists'),
    every surviving pin must read cleanly afterwards, and recovery
    finds nothing to heal."""
    import threading as _th

    from herodb_spark.sources.database import ConcurrentWriteError

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "bm"))
    errors: list[str] = []
    admissible = ("no table", "vacuum() before re-creating", "already exists",
                  "database version")

    def worker(wid: int):
        name = f"w{wid}"
        for cycle in range(3):
            try:
                db.create_table(
                    name,
                    spark.createDataFrame([(wid, cycle)], "k long, v long"),
                    key_cols=["k"],
                )
                with db.transaction() as t:
                    t.merge_upsert(
                        name, spark.createDataFrame([(100 + cycle, wid)], "k long, v long")
                    )
                db.drop_table(name)
            except ConcurrentWriteError:
                continue  # OCC loser retries next cycle
            except ValueError as e:
                if not any(a in str(e) for a in admissible):
                    errors.append(f"w{wid}/{cycle}: {e}")
            except Exception as e:  # noqa: BLE001 — stress: record, don't die
                errors.append(f"w{wid}/{cycle}: {type(e).__name__}: {e}")

    def vacuumer():
        for _ in range(4):
            try:
                db.vacuum(keep_last=1)
            except ConcurrentWriteError:
                pass
            except Exception as e:  # noqa: BLE001
                errors.append(f"vacuum: {type(e).__name__}: {e}")

    threads = [_th.Thread(target=worker, args=(i,)) for i in range(3)]
    threads.append(_th.Thread(target=vacuumer))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    # every surviving pin resolves and reads
    for name in db.tables():
        assert db.read(name).count() >= 0
    assert SnapshotDatabase(spark, db.path).recover() == {}
    # the system is still fully functional: a clean cycle end-to-end
    db.vacuum(keep_last=1)
    db.create_table("post", spark.createDataFrame([(1, 1)], "k long, v long"), key_cols=["k"])
    assert db.read("post").count() == 1
