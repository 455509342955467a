"""Database branching: the reference's data-package instantiate /
inherit / merge surface (Kernel/README.md "DATA PACKAGE": multiple
instances, inherit-instantiate, merge-to-parent, discard, and
HIGH-LEVEL FEATURES' delete-as-a-whole with dependency check) on the
snapshot lakehouse — sources/branch.py.

Load-bearing properties: O(1) zero-copy instantiation, copy-on-write
isolation in BOTH directions, fast-forward and disjoint-partition
overlay merges that lose neither side, conflict-cancel on overlap
(the reference's rollback-conflicted rule), GC that can never break a
live branch, and the dependency-checked whole-database delete."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from herodb_spark.sources.branch import MergeConflict
from herodb_spark.sources.database import SnapshotDatabase


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


def _vals(df):
    return {r.key: r.val for r in df.collect()}


def test_branch_is_zero_copy_and_isolated(spark, tmp_path):
    """branch() writes ONE manifest (no data files); parent commits
    after the branch point are invisible to the branch, branch writes
    invisible to the parent (inheritance with copy-on-write)."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    # zero copy: the branch dir holds no parquet at creation
    n_parquet = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(br.path)
    )
    assert n_parquet == 0
    # parent moves on — the branch pin does not
    with db.transaction() as t:
        t.merge_upsert(
            "facts", spark.createDataFrame([(100, 2, 7)], "key long, grp long, val long")
        )
    assert br.read("facts").where("key = 100").count() == 0
    # branch writes — the parent does not see them
    br.update_where("facts", F.col("grp") == 0, {"val": F.col("val") + 1000})
    assert db.read("facts").where("val > 900").count() == 0
    assert _vals(br.read("facts"))[0] == 1000
    # multiple instances of one package coexist
    br2 = db.branch("wip2")
    assert _vals(br2.read("facts"))[100] == 7  # branched later, newer pin
    assert sorted(db.branches()) == ["wip", "wip2"]
    db.drop_branch("wip", discard_changes=True)
    db.drop_branch("wip2")


def test_fork_rewrites_only_touched_partitions(spark, tmp_path):
    """The first branch write forks the table copy-on-write: only the
    mutated partition's files land in branch storage; untouched
    partitions keep resolving into PARENT storage by relative ref."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.update_where("facts", F.col("grp") == 1, {"val": F.lit(-1)})
    from herodb_spark.sources.snapshot import SnapshotTable

    local = os.path.join(br.path, "tables", "facts")
    m = SnapshotTable(spark, local)._load()
    head = m["versions"][str(m["current"])]["partitions"]
    assert head["1"].startswith("data/")          # rewritten locally
    assert head["0"].startswith("..")             # still parent storage
    assert head["2"].startswith("..")
    # and the read through the mixed map is correct
    got = _vals(br.read("facts"))
    assert got[1] == -1 and got[4] == -1 and got[0] == 0 and got[2] == 20


def test_fast_forward_merge(spark, tmp_path):
    """Parent untouched since the branch point: merge adopts the branch
    head wholesale (fast-forward), including new partitions."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.merge_upsert(
        "facts",
        spark.createDataFrame([(50, 9, 5), (51, 9, 6)], "key long, grp long, val long"),
    )
    rep = br.merge()
    assert rep["facts"] == "fast_forward"
    got = _vals(db.read("facts"))
    assert got[50] == 5 and got[51] == 6 and got[0] == 0
    # merge is atomic + recorded in history
    assert db.history()[-1]["op"] == "merge_branch:wip"


def test_overlay_merge_keeps_both_sides(spark, tmp_path):
    """Branch writes partition 0, parent interleaves on partition 2:
    the disjoint-partition overlay lands BOTH (the Page-granular
    arbitration of Lock.h:22-29 applied to merge)."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.update_where("facts", F.col("grp") == 0, {"val": F.col("val") + 1000})
    with db.transaction() as t:
        t.merge_upsert(
            "facts", spark.createDataFrame([(100, 2, 7)], "key long, grp long, val long")
        )
    rep = br.merge()
    assert rep["facts"] == "overlay"
    got = _vals(db.read("facts"))
    assert got[0] == 1000 and got[3] == 1030  # branch side
    assert got[100] == 7                      # parent side
    assert got[1] == 10                       # untouched partition


def test_conflict_cancels_and_parent_intact(spark, tmp_path):
    """Both sides rewrote the same partition: MergeConflict, parent
    state byte-identical, branch intact and retryable-after-rework."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.update_where("facts", F.col("grp") == 1, {"val": F.lit(0)})
    with db.transaction() as t:
        t.merge_upsert(
            "facts", spark.createDataFrame([(200, 1, 5)], "key long, grp long, val long")
        )
    before = _vals(db.read("facts"))
    hist_before = len(db.history())
    with pytest.raises(MergeConflict, match="both sides rewrote"):
        br.merge()
    assert _vals(db.read("facts")) == before
    assert len(db.history()) == hist_before
    # branch still readable (not corrupted by the cancelled merge)
    assert _vals(br.read("facts"))[1] == 0
    db.drop_branch("wip", discard_changes=True)


def test_branch_created_table_adopted(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.create_table(
        "notes", spark.createDataFrame([(1, "hi")], "id long, txt string"), key_cols=["id"]
    )
    assert br.read("notes").count() == 1
    rep = br.merge()
    assert rep["notes"] == "adopt"
    assert [(r.id, r.txt) for r in db.read("notes").collect()] == [(1, "hi")]
    # name-collision with an existing parent table refused at create
    br2 = db.branch("w2")
    with pytest.raises(ValueError, match="already exists"):
        br2.create_table(
            "facts", spark.createDataFrame([(1, 1, 1)], "key long, grp long, val long"),
            key_cols=["key"],
        )
    db.drop_branch("w2")


def test_drop_propagation_and_drop_conflict(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.drop_table("audit")
    rep = br.merge()
    assert rep["audit"] == "drop"
    assert "audit" not in db.tables()
    # drop-vs-write conflict cancels
    db2 = _mkdb(spark, str(tmp_path) + "_2")
    b2 = db2.branch("wip")
    b2.drop_table("audit")
    with db2.transaction() as t:
        t.merge_upsert(
            "audit", spark.createDataFrame([(9, "x")], "seq long, what string")
        )
    with pytest.raises(MergeConflict, match="dropped"):
        b2.merge()


def test_vacuum_never_breaks_a_live_branch(spark, tmp_path):
    """Parent vacuum keeps fork-base versions and parent-origin pins a
    branch reaches — branch reads survive aggressive GC."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.merge_upsert(
        "facts", spark.createDataFrame([(300, 0, 1)], "key long, grp long, val long")
    )
    for k in range(3):  # parent churns several versions
        with db.transaction() as t:
            t.merge_upsert(
                "facts",
                spark.createDataFrame([(400 + k, 2, k)], "key long, grp long, val long"),
            )
    db.vacuum(keep_last=1)
    got = _vals(br.read("facts"))
    assert got[300] == 1 and got[0] == 0 and got[1] == 10
    # audit (parent-origin pin) also survives
    assert br.read("audit").count() == 1
    rep = br.merge()
    assert rep["facts"] == "overlay"
    got = _vals(db.read("facts"))
    assert got[300] == 1 and got[400] == 0 and got[402] == 2


def test_merged_branch_is_closed_and_discardable(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.merge_upsert(
        "facts", spark.createDataFrame([(77, 0, 7)], "key long, grp long, val long")
    )
    br.merge()
    with pytest.raises(ValueError, match="already merged"):
        br.merge_upsert(
            "facts", spark.createDataFrame([(78, 0, 8)], "key long, grp long, val long")
        )
    with pytest.raises(ValueError, match="already merged"):
        br.merge()
    db.drop_branch("wip")  # merged: no discard flag needed
    assert db.branches() == []


def test_delete_whole_requires_dependents_gone(spark, tmp_path):
    """HIGH-LEVEL FEATURES: 'A data package can be deleted as a whole
    operation, which require all other packages that depend on it are
    deleted'."""
    db = _mkdb(spark, tmp_path)
    db.branch("dep")
    with pytest.raises(ValueError, match="dependent branches"):
        db.delete()
    db.drop_branch("dep")
    db.delete()
    assert not os.path.exists(db.path)


def test_branch_of_branch_and_bad_names(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    assert not hasattr(br, "branch")  # single-level by construction
    with pytest.raises(ValueError, match="invalid branch name"):
        db.branch(".hidden")
    with pytest.raises(ValueError, match="already exists"):
        db.branch("wip")
    # unknown branch
    with pytest.raises(ValueError, match="no branch"):
        db.open_branch("nope")


def test_merge_cancels_when_table_held_by_live_txn(spark, tmp_path):
    """A member table whose head ran ahead of the database pin (an
    in-flight transaction's private version) defers the merge — the
    transaction layer owns that arbitration."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.update_where("facts", F.col("grp") == 0, {"val": F.lit(1)})
    # simulate an in-flight txn: advance the member table directly
    # (eager table commit without the database pointer swap)
    db.table("facts").merge_upsert(
        spark.createDataFrame([(500, 2, 5)], "key long, grp long, val long")
    )
    with pytest.raises(MergeConflict, match="in-flight"):
        br.merge()
    db.recover()  # heal the orphan
    rep = br.merge()
    assert rep["facts"] in ("overlay", "fast_forward")


def test_db_branch_merge_oracle(spark, sf_dir, duck):
    """The standalone graded entry: branch/merge schedule hash-matched
    against the pure-SQL oracle over nation (same contract the driver
    enforces; the union copy rides snapshot_lifecycle's br_* legs)."""
    from herodb_spark.operators.lifecycle import DB_BRANCH_MERGE_SQL, db_branch_merge
    from tests.harness import compare

    res = compare(db_branch_merge(spark, sf_dir), DB_BRANCH_MERGE_SQL, duck)
    assert res["ok"], res


def test_merge_lost_swap_undoes_cleanly(spark, tmp_path, monkeypatch):
    """A parent commit landing between the merge's plan and its pin
    swap seq-fences the swap: the merge must UNDO its adopted table
    versions and directory moves, leave the parent consistent, and the
    branch intact for a retry."""
    from herodb_spark.sources import branch as B

    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.update_where("facts", F.col("grp") == 0, {"val": F.lit(77)})
    br.create_table(
        "extra", spark.createDataFrame([(1, 1)], "id long, v long"), key_cols=["id"]
    )
    parent_facts_cur = db.table("facts")._load()["current"]
    hist_before = len(db.history())

    orig_commit = db._mf._commit

    def racing_commit(m, **kw):
        # interleave a disjoint parent txn between plan and swap
        with SnapshotDatabase(spark, db.path).transaction() as t:
            t.merge_upsert(
                "audit", spark.createDataFrame([(5, "race")], "seq long, what string")
            )
        return orig_commit(m, **kw)

    monkeypatch.setattr(br.parent._mf, "_commit", racing_commit)
    with pytest.raises(MergeConflict, match="advanced during the merge"):
        br.merge()
    monkeypatch.undo()
    # parent: table version rolled back, no merge in history, name not
    # published, extra's dir back in branch storage
    assert db.table("facts")._load()["current"] == parent_facts_cur
    assert not any("merge_branch" in e["op"] for e in db.history())
    assert "extra" not in db.tables()
    assert not os.path.exists(db._table_path("extra"))
    assert br.read("extra").count() == 1  # branch storage restored
    # retry succeeds (branch not marked merged by the failed attempt)
    rep = br.merge()
    assert rep["facts"] == "fast_forward" and rep["extra"] == "adopt"
    assert _vals(db.read("facts"))[0] == 77
    assert db.read("extra").count() == 1


def test_unpartitioned_table_branch_semantics(spark, tmp_path):
    """Unpartitioned tables are ONE partition (_all): fast-forward
    merges work; both-sides divergence always conflicts (no partition
    granularity to arbitrate on) — pinned so nobody expects a
    row-level merge."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.merge_upsert(
        "audit", spark.createDataFrame([(10, "branch")], "seq long, what string")
    )
    rep = br.merge()
    assert rep["audit"] == "fast_forward"
    assert {(r.seq, r.what) for r in db.read("audit").collect()} == {
        (0, "init"), (10, "branch"),
    }
    b2 = db.branch("b2")
    b2.merge_upsert(
        "audit", spark.createDataFrame([(11, "b2")], "seq long, what string")
    )
    with db.transaction() as t:
        t.merge_upsert(
            "audit", spark.createDataFrame([(12, "main")], "seq long, what string")
        )
    with pytest.raises(MergeConflict, match="both sides rewrote"):
        b2.merge()
    db.drop_branch("b2", discard_changes=True)


@pytest.mark.parametrize("seed", [1, 7, 42, 99])
def test_branch_semantics_randomized_model(spark, tmp_path, seed):
    """Randomized schedule vs an in-Python model: interleave parent and
    branch upserts/updates/deletes over a partitioned table, tracking
    two independent key→val models (branch isolation) and each side's
    rewritten-partition set. At the end, merge: if the rewrite sets are
    DISJOINT the merged table must equal the parent model overlaid with
    the branch model's touched partitions; if they OVERLAP the merge
    must cancel and the parent must equal its own model untouched."""
    import random

    rng = random.Random(seed)
    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), f"db{seed}"))
    base = {i: i * 10 for i in range(12)}
    db.create_table(
        "t",
        spark.createDataFrame(
            [(k, k % 4, v) for k, v in base.items()], "key long, grp long, val long"
        ),
        key_cols=["key"],
        partition_col="grp",
    )
    parent_model = {k: (k % 4, v) for k, v in base.items()}
    br = db.branch("wip")
    branch_model = dict(parent_model)
    p_rew: set[int] = set()
    b_rew: set[int] = set()

    def apply(side, model, rew):
        op = rng.choice(["upsert", "update", "delete"])
        if op == "upsert":
            key = rng.randrange(0, 40)
            grp = rng.randrange(0, 4)
            val = rng.randrange(0, 1000)
            df = spark.createDataFrame([(key, grp, val)], "key long, grp long, val long")
            rew.add(grp)
            if key in model:
                rew.add(model[key][0])  # key may move partitions
            model[key] = (grp, val)
            if side == "parent":
                with db.transaction() as t:
                    t.merge_upsert("t", df)
            else:
                br.merge_upsert("t", df)
        elif op == "update":
            grp = rng.randrange(0, 4)
            delta = rng.randrange(1, 9)
            pred = F.col("grp") == grp
            if side == "parent":
                with db.transaction() as t:
                    t.update_where("t", pred, {"val": F.col("val") + F.lit(delta)})
            else:
                br.update_where("t", pred, {"val": F.col("val") + F.lit(delta)})
            touched = [k for k, (g, _v) in model.items() if g == grp]
            if touched:
                rew.add(grp)
            for k in touched:
                model[k] = (grp, model[k][1] + delta)
        else:
            kmod = rng.randrange(1, 6)
            pred = F.col("key") % 13 == kmod
            doomed = [k for k in model if k % 13 == kmod]
            if side == "parent":
                with db.transaction() as t:
                    t.delete_where("t", pred)
            else:
                br.delete_where("t", pred)
            for k in doomed:
                rew.add(model[k][0])
                del model[k]

    for _ in range(8):
        side = rng.choice(["parent", "branch"])
        apply(side, parent_model if side == "parent" else branch_model,
              p_rew if side == "parent" else b_rew)

    def table_state(database):
        return {r.key: (r.grp, r.val) for r in database.read("t").collect()}

    # isolation held throughout
    assert table_state(db) == parent_model
    assert {r.key: (r.grp, r.val) for r in br.read("t").collect()} == branch_model

    if b_rew and not (p_rew & b_rew):
        br.merge()
        # expected: parent rows, with branch-touched partitions replaced
        expected = {
            k: gv for k, gv in parent_model.items() if gv[0] not in b_rew
        } | {k: gv for k, gv in branch_model.items() if gv[0] in b_rew}
        assert table_state(db) == expected, (seed, p_rew, b_rew)
    elif b_rew:
        with pytest.raises(MergeConflict):
            br.merge()
        assert table_state(db) == parent_model
        db.drop_branch("wip", discard_changes=True)
    else:
        rep = br.merge()  # branch untouched: no-op merge
        assert all(v == "untouched" for v in rep.values())
        assert table_state(db) == parent_model


def test_write_audit_publish_streaming(spark, tmp_path):
    """WAP: micro-batches land exactly-once in a branch (parent readers
    never see them), a validation query audits the branch pin, merge
    publishes atomically; a stale batch replay no-ops at branch scope."""
    from herodb_spark.streaming.sink import BranchUpsertSink

    db = _mkdb(spark, tmp_path)
    br = db.branch("ingest")
    sink = BranchUpsertSink(br, "facts", sink_id="wap")
    for i in range(3):
        sink(
            spark.createDataFrame(
                [(600 + i, 0, i), (700 + i, 1, i)], "key long, grp long, val long"
            ),
            i,
        )
    # stale replay of batch 0 must no-op (watermark committed with pin)
    sink(
        spark.createDataFrame([(600, 0, 999)], "key long, grp long, val long"), 0
    )
    assert br.last_txn("wap") == 2
    # audit on the branch; parent sees nothing yet
    assert br.read("facts").where("key >= 600").count() == 6
    assert _vals(br.read("facts"))[600] == 0  # replay did not land
    assert db.read("facts").where("key >= 600").count() == 0
    # validation passed -> publish
    rep = br.merge()
    assert rep["facts"] in ("fast_forward", "overlay")
    assert db.read("facts").where("key >= 600").count() == 6


def test_merge_marker_crash_recovered_from_parent_history(spark, tmp_path):
    """r12-advice low: a crash between merge()'s parent swap and its
    merged=True branch-manifest commit leaves a branch CLAIMING
    divergence whose local rewrites already live in the parent.
    read()/mutations must detect the completed merge from parent
    history (merge_branch:<name> version past the branch point) and
    report 'already merged'; drop_branch must not demand
    discard_changes."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.merge_upsert(
        "facts", spark.createDataFrame([(7, 1, 777)], "key long, grp long, val long")
    )
    # capture the pre-marker manifest, merge, then restore it — exactly
    # the crash window's on-disk state (swap landed, marker lost)
    with open(br._mf._manifest_path()) as f:
        pre_marker = f.read()
    br.merge()
    with open(br._mf._manifest_path(), "w") as f:
        f.write(pre_marker)
    assert not br._load().get("merged")
    with pytest.raises(ValueError, match="already merged"):
        br.read("facts")
    with pytest.raises(ValueError, match="already merged"):
        br.merge_upsert(
            "facts",
            spark.createDataFrame([(8, 1, 8)], "key long, grp long, val long"),
        )
    # the heal persisted the marker; drop needs no discard_changes
    db.drop_branch("wip")
    assert db.branches() == []
    # the merged row is in the parent (the swap really landed)
    assert _vals(db.read("facts"))[7] == 777
    # a FRESH same-name branch is not poisoned by the old merge record
    br2 = db.branch("wip")
    br2.merge_upsert(
        "facts", spark.createDataFrame([(9, 1, 9)], "key long, grp long, val long")
    )
    assert _vals(br2.read("facts"))[9] == 9
    br2.merge()
    db.drop_branch("wip")


def test_merge_marker_recovery_survives_parent_vacuum(spark, tmp_path):
    """The parent-history evidence _merge_completed relies on must
    survive db.vacuum while the branch still exists: vacuum keeps the
    newest merge_branch:<b> version for every live branch, so a
    crashed-marker branch still detects its completed merge after GC."""
    db = _mkdb(spark, tmp_path)
    br = db.branch("wip")
    br.merge_upsert(
        "facts", spark.createDataFrame([(7, 1, 777)], "key long, grp long, val long")
    )
    with open(br._mf._manifest_path()) as f:
        pre_marker = f.read()
    br.merge()
    with open(br._mf._manifest_path(), "w") as f:
        f.write(pre_marker)
    # bury the merge version under later parent commits, then vacuum
    for i in range(3):
        with db.transaction() as t:
            t.merge_upsert(
                "facts",
                spark.createDataFrame([(60 + i, 0, i)], "key long, grp long, val long"),
            )
    db.vacuum(keep_last=1)
    # the merge evidence survived: still detected as merged, not
    # "unmerged divergence" over parent-adopted (vanished) paths
    with pytest.raises(ValueError, match="already merged"):
        br.read("facts")
    db.drop_branch("wip")
    # once the branch is gone the evidence is prunable
    db.vacuum(keep_last=1)
    assert _vals(db.read("facts"))[7] == 777
