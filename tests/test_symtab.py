"""Symbol-table / type-installation programs (draft_type:115-341) and
the AutoIncresed id allocator (draft_type:127-129)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from herodb_spark.operators import symtab as ST
from herodb_spark.sources.registry import auto_increment_ids
from tests.harness import compare

ORACLE_CASES = [
    (ST.symtab_resolve, ST.SYMTAB_RESOLVE_SQL),
    (ST.symtab_apply_type, ST.SYMTAB_APPLY_TYPE_SQL),
    (ST.symtab_suite, ST.SYMTAB_SUITE_SQL),
]


@pytest.mark.parametrize("fn,sql", ORACLE_CASES, ids=[f.__name__ for f, _ in ORACLE_CASES])
def test_symtab_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_symtab_shadowing_innermost_scope_wins(spark, sf_dir):
    """The law the scope chain exists for (draft_type:163-172): a
    `seg` ref resolves to the NATION binding where the nation scope
    defines one (even keys), else falls through to the REGION binding
    — never the other way around."""
    from herodb_spark.catalog import load_table

    out = ST.symtab_resolve(spark, sf_dir)
    segs = out.where((F.col("kind") == "type") & (F.col("name") == "seg"))
    cust = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") * 10).cast("long").alias("expr_id"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    joined = segs.join(cust, "expr_id").collect()
    assert joined, "no seg refs resolved"
    for r in joined:
        if r.nk % 2 == 0:
            assert r.info.startswith("Distinguished(N:"), r
            assert r.scope == 100 + r.nk, r
        else:
            assert r.info.startswith("Distinguished(R:"), r
            assert 1 <= r.scope <= 5, r


def test_symtab_duplicate_first_wins(spark, sf_dir):
    """Unique(scope, name) with `if not set … then set Errors`
    (draft_type:320-326): the earliest creator installs the symbol;
    every later same-(scope, name) install errors — and the error
    count is exactly installs - distinct."""
    inst = ST.symbol_installs(spark, sf_dir)
    n_installs = inst.count()
    n_distinct = inst.select("scope", "name").distinct().count()
    out = ST.symtab_resolve(spark, sf_dir)
    dup = out.where(F.col("info").startswith("Duplicated")).collect()
    assert len(dup) == n_installs - n_distinct
    winners = inst.groupBy("scope", "name").agg(F.min("created_by").alias("w"))
    losers = {(r.scope, r.name, r.expr_id) for r in dup}
    for s, n, w in [(r.scope, r.name, r.w) for r in winners.collect()]:
        assert (s, n, w) not in losers, "a winning install was reported as duplicate"


def test_symtab_not_found_errors(spark, sf_dir):
    """TranslateType's RefType miss (draft_type:277-282): every 97th
    customer's ghost ref yields BOTH an Unknown#<id> ExprType and a
    'Type … not found.' error, ids dense in creation order."""
    from herodb_spark.catalog import load_table

    n_ghost = (
        load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 97 == 0).count()
    )
    out = ST.symtab_resolve(spark, sf_dir)
    nf = out.where(F.col("info").contains("not found")).collect()
    unk = out.where(F.col("info").startswith("Unknown#")).collect()
    assert len(nf) == n_ghost == len(unk)
    ids = sorted(int(r.info.split("#")[1]) for r in unk)
    assert ids == list(range(1, n_ghost + 1)), "AutoIncresed ids must be dense from 1"


def test_apply_type_substitution_branches(spark, sf_dir):
    """ApplyTypeInternal's belongTo dispatch (draft_type:260-263):
    even regions' terminal arg substitutes to Int, odd regions'
    (belonging to a different lambda) survives as Arg(L...)."""
    rows = ST.symtab_apply_type(spark, sf_dir).collect()
    by_region: dict[int, list] = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    assert sorted(by_region) == [0, 1, 2, 3, 4]
    for region, rs in by_region.items():
        rs.sort(key=lambda r: r.pos)
        # chain: one Distinguished per nation of the region, then terminal
        assert all(x.type_name.startswith("Distinguished(") for x in rs[:-1])
        term = rs[-1].type_name
        if region % 2 == 0:
            assert term == "Int", (region, term)
        else:
            assert term == f"Arg(L{(region + 1) % 5})", (region, term)


# ---------------------------------------------------------------------------
# AutoIncresed allocator
# ---------------------------------------------------------------------------


def test_auto_increment_dense_deterministic(spark):
    df = spark.range(0, 1000).select((F.col("id") * 7 % 1000).alias("k"))
    a = auto_increment_ids(df, id_col="aid", order_by=["k"])
    got = {r.k: r.aid for r in a.collect()}
    assert sorted(got.values()) == list(range(1, 1001))
    # deterministic: id == rank of k in sort order (k is a permutation)
    assert all(got[k] == k + 1 for k in (0, 1, 499, 999))
    # stable across re-evaluation
    again = {r.k: r.aid for r in auto_increment_ids(df, id_col="aid", order_by=["k"]).collect()}
    assert got == again


def test_auto_increment_append_offset(spark):
    """Append semantics: start = existing max + 1 continues the
    sequence with no collisions across the union."""
    base = spark.range(0, 50).select(F.col("id").alias("k"))
    first = auto_increment_ids(base, id_col="aid", order_by=["k"])
    mx = first.agg(F.max("aid")).collect()[0][0]
    more = spark.range(100, 130).select(F.col("id").alias("k"))
    second = auto_increment_ids(more, id_col="aid", order_by=["k"], start=mx + 1)
    both = first.unionByName(second)
    ids = [r.aid for r in both.collect()]
    assert sorted(ids) == list(range(1, 81))


def test_auto_increment_dense_across_real_partitions(spark):
    """Regression (round-5 review, CONFIRMED repro): the offset-map
    lookup must read the SAME partition id the window grouped by — a
    bare spark_partition_id() in the final projection evaluates above
    the window's Exchange (post-shuffle pid) while offsets are keyed
    by pre-shuffle pids, colliding at any multi-partition size. Unit
    sizes hid it because AQE coalesces tiny shuffles to one
    partition; pin BOTH a forced-8-partition layout and an AQE-default
    large input."""
    # forced multi-partition: 8 real partitions of 1000 rows
    df = spark.range(0, 1000).select((F.col("id") * 13 % 1000).alias("k"))
    out = auto_increment_ids(df, id_col="aid", order_by=["k"], num_partitions=8)
    got = {r.k: r.aid for r in out.collect()}
    assert sorted(got.values()) == list(range(1, 1001))
    assert all(got[k] == k + 1 for k in (0, 1, 777, 999))
    # AQE-default path, large enough that the shuffle keeps >1 partition
    big = spark.range(0, 400_000).select((F.col("id") * 7 % 400_000).alias("k"))
    ids = auto_increment_ids(big, id_col="aid", order_by=["k"])
    stats = ids.agg(
        F.countDistinct("aid").alias("n"), F.min("aid").alias("lo"), F.max("aid").alias("hi")
    ).collect()[0]
    assert (stats.n, stats.lo, stats.hi) == (400_000, 1, 400_000)


def test_auto_increment_sparse_mode_unique(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("k")).repartition(8)
    out = auto_increment_ids(df, id_col="aid", order_by=None, start=10)
    ids = [r.aid for r in out.collect()]
    assert len(set(ids)) == 5000
    assert min(ids) >= 10


def test_symtab_unify_oracle(spark, sf_dir, duck):
    res = compare(ST.symtab_unify(spark, sf_dir), ST.SYMTAB_UNIFY_SQL, duck)
    assert res["ok"], res


def test_symtab_unify_laws(spark, sf_dir):
    """Unification invariants: every conflict class really holds two
    concrete constructors, every occurs class embeds a class-mate
    variable under a func, binds never reference a bad class, and a
    var unified with a function type resolves 'func'."""
    from herodb_spark.catalog import load_table

    out = ST.symtab_unify(spark, sf_dir).collect()
    by_kind: dict[str, list] = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r)
    n_cust = load_table(spark, sf_dir, "customer").count()
    binds = by_kind.get("bind", [])
    assert binds, "no bindings produced"
    bad_reps = {r.rep for r in by_kind.get("conflict", [])} | {
        r.rep for r in by_kind.get("occurs", [])
    }
    assert all(r.rep not in bad_reps for r in binds)
    # V_k for ordinary k resolves to its Func binding
    funcs = sum(1 for r in binds if r.info == "func")
    assert funcs > n_cust  # every V_k (minus error ks) plus chained L_k classes
    # conflict ks exist at every SF (k=37 < 150); they all share Int's
    # class, so exactly ONE conflict class
    assert len(by_kind.get("conflict", [])) == 1
    # occurs ks exist at every SF (k=53)
    assert len(by_kind.get("occurs", [])) >= 1
