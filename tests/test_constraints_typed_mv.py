"""Constraints / typed-schema / incremental-MV operators (reference
draft:111 ensure, draft_type declarations, draft:67-72 cached
computed tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from herodb_spark.operators import constraints as CN
from herodb_spark.operators import matview as MV
from herodb_spark.operators import typed as TY
from tests.harness import compare

CASES = [
    (CN.ensure_constraints, CN.ENSURE_CONSTRAINTS_SQL),
    (TY.typed_struct_enum, TY.TYPED_STRUCT_ENUM_SQL),
    (MV.incremental_mv_refresh, MV.INCREMENTAL_MV_SQL),
    (CN.constraints_typed, CN.CONSTRAINTS_TYPED_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_ensure_raises_on_violation(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    rules = [CN.unique("uniq_k", df, ["k"])]
    with pytest.raises(CN.ConstraintViolation, match="uniq_k: 1"):
        CN.ensure(rules)


def test_ensure_passes_on_clean_rules(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    CN.ensure(
        [
            CN.unique("uniq_k", df, ["k"]),
            CN.not_null("nn_v", df, "v"),
            CN.domain("dom_v", df, "v", ["a", "b"]),
            CN.check("pos_k", df, F.col("k") > 0),
        ]
    )


def test_enum_ordinal_roundtrip_and_invalid(spark):
    e = TY.EVENT_TYPE_ENUM
    df = spark.createDataFrame([("click",), ("view",), ("bogus",), (None,)], "t string")
    out = df.select(
        e.ordinal(F.col("t")).alias("o"), e.is_valid(F.col("t")).alias("ok")
    ).collect()
    assert [(r.o, r.ok) for r in out] == [(0, True), (4, True), (None, False), (None, False)]
    back = df.select(e.label(e.ordinal(F.col("t"))).alias("l")).collect()
    assert [r.l for r in back] == ["click", "view", None, None]


def test_refresh_equals_rebuild(spark, sf_dir):
    """Algebraic merge over an arbitrary date split must equal a full
    rebuild (a different cutoff than the registered query uses)."""
    from herodb_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    specs = MV._order_specs()
    keys = ["o_orderpriority"]
    cutoff = "1996-06-01"
    mv = MV.build_mv(orders.where(F.col("o_orderdate") < cutoff), keys, specs)
    refreshed = MV.refresh_mv(
        mv, orders.where(F.col("o_orderdate") >= cutoff), keys, specs
    )
    full = MV.build_mv(orders, keys, specs)
    a = {tuple(r) for r in refreshed.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b


def test_refresh_scans_only_delta(spark, sf_dir):
    """The refresh plan's parquet scans must push the date filters —
    i.e. the delta path reads the delta, not the full base table."""
    df = MV.incremental_mv_refresh(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    date_pushes = [p for p in pushed if "o_orderdate" in p]
    assert len(date_pushes) >= 2, f"expected both MV and delta scans filtered: {pushed}"


def test_refresh_mv_all_null_sum_group(spark):
    """A group whose sum inputs are all NULL must refresh to NULL
    (indistinguishable from a rebuild), not 0."""
    from pyspark.sql import functions as F

    from herodb_spark.operators.matview import build_mv, refresh_mv

    base = spark.createDataFrame(
        [("g1", None), ("g2", 5.0)], "k string, v double"
    )
    delta = spark.createDataFrame([("g1", None)], "k string, v double")
    specs = [("n", "count", F.lit(1)), ("s", "sum", F.col("v"))]
    mv = build_mv(base, ["k"], specs)
    out = {r.k: (r.n, r.s) for r in refresh_mv(mv, delta, ["k"], specs).collect()}
    assert out["g1"] == (2, None)  # all-NULL sums stay NULL
    assert out["g2"] == (1, 5.0)


def test_mv_cdc_refresh_matches_oracle(spark, sf_dir, duck):
    res = compare(MV.mv_cdc_refresh(spark, sf_dir), MV.MV_CDC_REFRESH_SQL, duck)
    assert res["ok"], res


def test_refresh_from_changes_equals_rebuild(spark, tmp_path):
    """CDC refresh vs full rebuild on a snapshot history covering all
    four change kinds, incl. a FULLY-DELETED group (must leave the
    view) and a deleted group-max (must recompute to the runner-up)."""
    import os

    from herodb_spark.sources.snapshot import SnapshotTable

    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "b", 7.0),
        (5, "gone", 1.0), (6, "gone", 2.0),
    ]
    base = spark.createDataFrame(rows, "id long, k string, v double")
    snap = SnapshotTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    keys, specs = ["k"], [
        ("n", "count", None), ("s", "sum", F.col("v")), ("mx", "max", F.col("v")),
    ]
    mv0 = MV.build_mv(snap.read(), keys, specs)
    snap.delete_where(F.col("k") == "gone")          # whole group retracted
    snap.delete_where(F.col("id") == 2)              # group max of 'a' deleted
    snap.update_where(F.col("id") == 3, {"v": F.lit(50.0)})  # new max for 'b'
    snap.merge_upsert(spark.createDataFrame([(7, "c", 9.0)], "id long, k string, v double"))
    refreshed = MV.refresh_mv_from_changes(
        mv0, snap.read_changes(0), keys, specs, base=snap.read()
    )
    rebuilt = MV.build_mv(snap.read(), keys, specs)
    got = {r.k: (r.n, r.s, r.mx) for r in refreshed.collect()}
    want = {r.k: (r.n, r.s, r.mx) for r in rebuilt.collect()}
    assert got == want
    assert "gone" not in got          # count→0 group removed
    assert got["a"] == (1, 10.0, 10.0)  # deleted max recomputed
    assert got["b"] == (2, 57.0, 50.0)  # update pre/post netted
    assert got["c"] == (1, 9.0, 9.0)    # new group appears


def test_refresh_from_changes_minmax_requires_base(spark):
    import pytest as _pytest

    ch = spark.createDataFrame([(1, "a", 1.0, "insert")], "id long, k string, v double, _change string")
    mv = spark.createDataFrame([("a", 1)], "k string, n long")
    with _pytest.raises(ValueError, match="min/max"):
        MV.refresh_mv_from_changes(mv, ch, ["k"], [("mx", "max", F.col("v"))])


def test_refresh_from_changes_countless_specs(spark, tmp_path):
    """r7 advice: WITHOUT a count spec, a fully-retracted group must
    still leave the view (membership against `base` decides), and
    sum-only specs with neither count nor base must raise instead of
    silently keeping stale rows."""
    import pytest as _pytest

    from herodb_spark.sources.snapshot import SnapshotTable

    rows = [(1, "a", 10.0), (2, "gone", 3.0), (3, "gone", 4.0)]
    base = spark.createDataFrame(rows, "id long, k string, v double")
    snap = SnapshotTable.create(spark, str(tmp_path / "t"), base, key_cols=["id"])
    keys = ["k"]
    specs = [("s", "sum", F.col("v")), ("mx", "max", F.col("v"))]
    mv0 = MV.build_mv(snap.read(), keys, specs)
    snap.delete_where(F.col("k") == "gone")
    refreshed = MV.refresh_mv_from_changes(
        mv0, snap.read_changes(0), keys, specs, base=snap.read()
    )
    got = {r.k: (r.s, r.mx) for r in refreshed.collect()}
    assert got == {"a": (10.0, 10.0)}  # retracted group gone, no count spec

    ch = snap.read_changes(0)
    with _pytest.raises(ValueError, match="count"):
        MV.refresh_mv_from_changes(mv0, ch, keys, [("s", "sum", F.col("v"))])


def test_refresh_from_changes_null_keyed_group_survives(spark, tmp_path):
    """r8 review finding: with sum/max-only specs (no count), a
    NULL-keyed group touched by the feed must NOT be classified as
    fully retracted while base rows survive (the dead-group anti join
    is null-safe)."""
    from herodb_spark.sources.snapshot import SnapshotTable

    rows = [(1, None, 10.0), (2, None, 3.0), (3, "a", 4.0)]
    base = spark.createDataFrame(rows, "id long, k string, v double")
    snap = SnapshotTable.create(spark, str(tmp_path / "tn"), base, key_cols=["id"])
    keys = ["k"]
    specs = [("s", "sum", F.col("v")), ("mx", "max", F.col("v"))]
    mv0 = MV.build_mv(snap.read(), keys, specs)
    snap.delete_where(F.col("id") == 2)  # NULL group touched, id=1 survives
    refreshed = MV.refresh_mv_from_changes(
        mv0, snap.read_changes(0), keys, specs, base=snap.read()
    )
    got = {r.k: (r.s, r.mx) for r in refreshed.collect()}
    rebuilt = {
        r.k: (r.s, r.mx) for r in MV.build_mv(snap.read(), keys, specs).collect()
    }
    assert got == rebuilt == {None: (10.0, 10.0), "a": (4.0, 4.0)}
