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
