"""Z-order clustering (OPTIMIZE ZORDER BY) + per-file zone maps:
SnapshotTable.cluster() and file-granular data skipping in read()."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from herodb_spark.sources.snapshot import SnapshotTable


def _mk(spark, tmp_path, n=4096, partitioned=True):
    """Rows whose x and y are independent (shuffled against each
    other) so neither a plain sort nor partitioning alone could serve
    both; g gives 2 table partitions."""
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.col("id").alias("x"),
        # deterministic pseudo-shuffle of y against x
        ((F.col("id") * 2654435761) % n).alias("y"),
        (F.col("id") % 2).alias("g"),
    )
    return SnapshotTable.create(
        spark,
        os.path.join(str(tmp_path), "t"),
        df,
        key_cols=["k"],
        partition_col="g" if partitioned else None,
    )


def test_cluster_preserves_content_exactly(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = sorted(tuple(r) for r in t.read().collect())
    out = t.cluster(["x", "y"], files_per_partition=4)
    assert sum(out["files"].values()) >= 2
    m = t._load()
    assert m["current"] == 1
    assert m["versions"]["1"]["op"] == "cluster"
    assert sorted(tuple(r) for r in t.read().collect()) == before
    # time travel to the pre-cluster layout still works
    assert sorted(tuple(r) for r in t.read(version=0).collect()) == before


def test_cluster_records_file_stats_and_read_skips_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.cluster(["x", "y"], files_per_partition=8)
    m = t._load()
    fs = m["file_stats"]
    rels = set(m["versions"]["1"]["partitions"].values())
    assert set(fs) == rels
    total_files = sum(len(v) for v in fs.values())
    assert total_files >= 8
    # a narrow x-range must scan a strict subset of files and return
    # exactly the right rows
    full = t.read()
    pruned = t.read(ranges={"x": (100, 140)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = sorted(r.k for r in pruned.where("x between 100 and 140").collect())
    assert got == list(range(100, 141))
    # all qualifying rows are present BEFORE the row filter (skipping
    # is IO-only, never loses a row)
    assert pruned.where("x between 100 and 140").count() == 41


def test_zorder_serves_both_columns(spark, tmp_path):
    """The z-order claim: a range on x AND a range on y must EACH
    prune files (a lexicographic sort would only serve x)."""
    t = _mk(spark, tmp_path, partitioned=False)
    t.cluster(["x", "y"], files_per_partition=16)
    n_all = len(t.read().inputFiles())
    n_x = len(t.read(ranges={"x": (0, 255)}).inputFiles())
    n_y = len(t.read(ranges={"y": (0, 255)}).inputFiles())
    assert n_x < n_all, "x range did not prune"
    assert n_y < n_all, "y range did not prune"
    # correctness under both prunings
    assert t.read(ranges={"y": (0, 255)}).where("y <= 255").count() == 256


def test_mutation_after_cluster_stays_correct(spark, tmp_path):
    """A later upsert rewrites one partition into dirs WITHOUT file
    stats — ranges reads must scan those whole and stay exact."""
    t = _mk(spark, tmp_path)
    t.cluster(["x"], files_per_partition=4)
    t.merge_upsert(
        spark.createDataFrame([(10_000, 120, 7, 0)], "k long, x long, y long, g long")
    )
    m = t._load()
    # the rewritten partition's new dir carries no file stats
    new_rel = m["versions"]["2"]["partitions"]["0"]
    assert new_rel not in m.get("file_stats", {})
    got = sorted(r.k for r in t.read(ranges={"x": (100, 140)}).where("x between 100 and 140").collect())
    assert got == list(range(100, 141)) + [10_000]


def test_vacuum_drops_file_stats_of_dropped_dirs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.cluster(["x"], files_per_partition=4)
    clustered_rels = set(t._load()["file_stats"])
    # full overwrite supersedes the clustered dirs, then vacuum
    t.overwrite(t.read().withColumn("x", F.col("x") + 0))
    t.vacuum(keep_last=1)
    m = t._load()
    assert not set(m.get("file_stats", {})) & clustered_rels
    assert t.read().count() == 4096


def test_cluster_rejects_non_numeric_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "t2"), df, key_cols=["k"])
    with pytest.raises(ValueError, match="numeric"):
        t.cluster(["s"])


def test_cluster_is_occ_fenced(spark, tmp_path):
    from herodb_spark.sources.snapshot import ConcurrentWriteError

    t = _mk(spark, tmp_path)
    stale = SnapshotTable(spark, t.path)
    m = stale._load()  # noqa: F841 — simulate a reader snapshot
    t.merge_upsert(spark.createDataFrame([(9_999, 1, 1, 0)], "k long, x long, y long, g long"))
    # cluster() itself re-reads, so race it: monkeypatch its read seq
    # by replaying a commit between load and commit is intricate —
    # assert instead that cluster over the advanced table succeeds and
    # a second, concurrent-style commit against the OLD version fails
    t.cluster(["x"])
    with pytest.raises(ConcurrentWriteError):
        t._commit({"current": 0, "versions": {}}, expected_current=0, expected_seq=0)


def test_database_scope_cluster_publishes_through_pin(spark, tmp_path):
    """db.cluster() must advance the DATABASE pin to the clustered
    version (a bare table cluster would be rolled back as a crash
    leftover by recovery)."""
    from herodb_spark.sources.database import SnapshotDatabase

    db = SnapshotDatabase.create(spark, os.path.join(str(tmp_path), "db"))
    df = spark.range(512).select(
        F.col("id").alias("k"), F.col("id").alias("x"), (F.col("id") % 2).alias("g")
    )
    db.create_table("t", df, key_cols=["k"], partition_col="g")
    before = sorted(tuple(r) for r in db.read("t").collect())
    rep = db.cluster("t", ["x"], files_per_partition=4)
    assert sum(rep["files"].values()) >= 2
    assert db.tables()["t"] == 1  # pin advanced to the clustered version
    assert sorted(tuple(r) for r in db.read("t").collect()) == before
    # recovery heals nothing — the clustered version is the pin
    assert db.recover() == {}


def test_heroql_pushdown_prunes_files_on_clustered_tables(spark, tmp_path):
    """A HeroQL comparison conjunct on a clustered key column must
    prune at FILE granularity through the zone-map pushdown (the
    language never mentions files — read(ranges) does it)."""
    from herodb_spark.heroql import HeroQL

    t = _mk(spark, tmp_path, partitioned=False)
    t.cluster(["k"], files_per_partition=16)
    hql = HeroQL(spark)
    hql.register_snapshot("T", t)
    n_all = len(hql.run("query (k) :- T(k, _, _, _);").queries[0].inputFiles())
    out = hql.run("query (k) :- T(k, _, _, _), k >= 100, k <= 140;").queries[0]
    assert len(out.inputFiles()) < n_all
    assert sorted(r.k for r in out.collect()) == list(range(100, 141))


def test_pruned_reads_equal_filtered_full_reads_random_ranges(spark, tmp_path):
    """Property: for random range predicates over a clustered table,
    read(ranges) + the row filter returns exactly the same rows as the
    unpruned read + the same filter — skipping is IO-only, never
    drops a qualifying row (file-level and partition-level alike)."""
    import random

    rng = random.Random(11)
    t = _mk(spark, tmp_path, n=2048)
    t.cluster(["x", "y"], files_per_partition=8)
    full = t.read()
    for _ in range(6):
        col = rng.choice(["x", "y", "k"])
        lo = rng.randint(0, 2000)
        hi = lo + rng.randint(0, 600)
        cond = f"{col} between {lo} and {hi}"
        pruned = t.read(ranges={col: (lo, hi)})
        want = sorted(r.k for r in full.where(cond).collect())
        got = sorted(r.k for r in pruned.where(cond).collect())
        assert got == want, (col, lo, hi)
