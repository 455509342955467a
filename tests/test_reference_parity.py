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
