"""Namespace/database/module organization (draft:168-197),
query-driven mutation (draft:138-143) and cache/uncache
(draft:67-72, 135-136)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from herodb_spark import namespace as NS
from herodb_spark.catalog import load_table
from herodb_spark.operators import matview as MV
from herodb_spark.operators import mutation as MU
from tests.harness import compare


def test_for_query_set_oracle(spark, sf_dir, duck):
    res = compare(MU.for_query_set(spark, sf_dir), MU.FOR_QUERY_SET_SQL, duck)
    assert res["ok"], res


def test_for_query_apply_leaves_unmatched_rows(spark):
    base = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, s string, v int")
    driving = spark.createDataFrame([(1,)], "k int")
    out = {
        r.k: (r.s, r.v)
        for r in MU.for_query_apply(
            base, driving, "k", {"s": F.lit("HIT"), "v": F.col("v") + 1}
        ).collect()
    }
    assert out == {1: ("HIT", 11), 2: ("b", 20)}


def test_for_query_apply_uses_pre_image(spark):
    """MERGE pre-image semantics: every assignment expression must see
    the PRE-mutation row, regardless of dict order."""
    base = spark.createDataFrame([(1, 10, 0)], "k int, bal int, tot int")
    driving = spark.createDataFrame([(1,)], "k int")
    out = MU.for_query_apply(
        base, driving, "k", {"bal": F.lit(0), "tot": F.col("bal") * 2}
    ).collect()[0]
    assert (out.bal, out.tot) == (0, 20), out  # tot from OLD bal


def test_uncache_predicate_keeps_null_evaluating_rows(spark):
    db = NS.Database("t")
    df = spark.createDataFrame([(1, "URGENT"), (2, None), (3, "LOW")], "k int, x string")
    db.cache("c::t", df)
    db.uncache("c::t", F.col("x") == "URGENT")
    kept = {r.k for r in db.resolve("c::t").collect()}
    assert kept == {2, 3}, kept  # NULL-evaluating row 2 must survive


def test_refresh_mv_merges_null_group_keys(spark):
    base = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0)], "g string, v double"
    )
    specs = [("n", "count", None), ("s", "sum", F.col("v"))]
    mv = MV.build_mv(base.where(F.col("v") <= 1.5), ["g"], specs)
    refreshed = MV.refresh_mv(mv, base.where(F.col("v") > 1.5), ["g"], specs)
    full = MV.build_mv(base, ["g"], specs)
    assert set(map(tuple, refreshed.collect())) == set(map(tuple, full.collect()))


def test_register_rejects_mangling_ambiguous_names(spark, sf_dir):
    db = NS.Database("t2")
    with pytest.raises(ValueError, match="reserved"):
        db.register("a__b", load_table(spark, sf_dir, "nation"))


@pytest.fixture()
def module(spark, sf_dir):
    trade = NS.Database("trade")
    trade.register("tpch::customer", load_table(spark, sf_dir, "customer"))
    trade.register("tpch::orders", load_table(spark, sf_dir, "orders"))
    trade.register("internal::audit", load_table(spark, sf_dir, "nation"), public=False)
    content = NS.Database("content")
    content.register("docs::documents", load_table(spark, sf_dir, "documents"))
    content.reference(trade)
    mod = NS.ModuleInstance("prod")
    mod.install(trade)
    mod.install(content)
    return mod, trade, content


def test_namespace_resolution_and_using(module):
    mod, trade, content = module
    # qualified
    assert trade.resolve("tpch::customer").columns[0] == "c_custkey"
    # via using-namespace search path
    assert trade.resolve("orders", using=["tpch"]).columns[0] == "o_orderkey"
    # namespace listing
    assert trade.namespace("tpch") == ["tpch::customer", "tpch::orders"]
    with pytest.raises(NS.SymbolNotFound):
        trade.resolve("nonexistent")


def test_cross_database_public_only(module):
    mod, trade, content = module
    # content references trade: public symbols usable...
    assert content.resolve("customer", using=["tpch"]).columns[0] == "c_custkey"
    # ...private ones are not
    with pytest.raises(NS.SymbolNotFound):
        content.resolve("audit", using=["internal"])


def test_module_isolation(module, spark, sf_dir):
    mod, trade, content = module
    other = NS.ModuleInstance("staging")
    foreign = NS.Database("trade")  # same name, different instance
    other.install(foreign)
    with pytest.raises(NS.ModuleIsolationError):
        mod.check_same_module(foreign)
    # a database installed twice in one module is rejected
    with pytest.raises(ValueError):
        mod.install(NS.Database("trade"))


def test_sql_surface(module, spark):
    """An installed database's views default to the OWNING MODULE's
    prefix (install() records it; same-named databases in different
    modules must not overwrite each other's views)."""
    mod, trade, content = module
    trade.sql_register()
    n = spark.sql("SELECT COUNT(*) AS n FROM prod__trade__tpch__customer").collect()[0].n
    assert n == trade.resolve("tpch::customer").count()
    # a standalone (uninstalled) database keeps the unprefixed name
    solo = NS.Database("solo")
    solo.register("t", trade.resolve("tpch::customer"))
    solo.sql_register()
    assert spark.sql("SELECT COUNT(*) AS n FROM solo__t").collect()[0].n == n


def test_module_isolation_enforced(module, spark, sf_dir):
    """draft:193-197: databases installed in DIFFERENT modules cannot
    reference or resolve each other's symbols."""
    mod, trade, content = module
    other = NS.ModuleInstance("staging")
    foreign = NS.Database("foreign")
    foreign.register("t", load_table(spark, sf_dir, "nation"))
    other.install(foreign)
    with pytest.raises(NS.ModuleIsolationError):
        foreign.reference(trade)
    # a reference taken BEFORE installation is re-checked at resolve
    loose = NS.Database("loose")
    loose.reference(trade)  # both sides uninstalled/one-sided: allowed
    other2 = NS.ModuleInstance("qa")
    other2.install(loose)
    with pytest.raises(NS.ModuleIsolationError):
        loose.resolve("tpch::customer")


def test_mangling_collision_components_rejected():
    with pytest.raises(ValueError, match="mangling"):
        NS.Database("x_")
    with pytest.raises(ValueError, match="mangling"):
        NS.ModuleInstance("m__x")


def test_cache_and_partial_uncache(module, spark, sf_dir):
    mod, trade, content = module
    orders = load_table(spark, sf_dir, "orders")
    mv = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    trade.cache("derived::priority_counts", mv)
    full = {r.o_orderpriority: r.n for r in trade.resolve("derived::priority_counts").collect()}
    assert len(full) == 5
    # uncache Table(...) :- pred — invalidate one group only
    trade.uncache("derived::priority_counts", F.col("o_orderpriority") == "1-URGENT")
    part = {r.o_orderpriority: r.n for r in trade.resolve("derived::priority_counts").collect()}
    assert set(full) - set(part) == {"1-URGENT"}
    assert all(part[k] == full[k] for k in part)
    # uncache Table — drop entirely
    trade.uncache("derived::priority_counts")
    with pytest.raises(NS.SymbolNotFound):
        trade.resolve("derived::priority_counts")
    with pytest.raises(NS.SymbolNotFound):
        trade.uncache("derived::priority_counts")


def test_register_public_lifts_private_marking(module, spark, sf_dir):
    mod, trade, content = module
    trade.register("internal::audit", load_table(spark, sf_dir, "nation"), public=True)
    assert content.resolve("audit", using=["internal"]).columns[0] == "n_nationkey"


def test_mangling_collision_segments_rejected(spark, sf_dir):
    db = NS.Database("d3")
    df = load_table(spark, sf_dir, "nation")
    for bad in ["a_::_b", "a::::b", "::a", "a::"]:
        with pytest.raises(ValueError):
            db.register(bad, df)


def test_database_cannot_join_two_modules(module):
    mod, trade, content = module
    other = NS.ModuleInstance("staging")
    with pytest.raises(NS.ModuleIsolationError):
        other.install(trade)


def test_sql_register_skips_private_and_scopes_by_module(module, spark):
    mod, trade, content = module
    trade.sql_register(module=mod.name)
    assert spark.catalog.tableExists("prod__trade__tpch__customer")
    # private symbols never get a session-global view by default
    assert not spark.catalog.tableExists("prod__trade__internal__audit")
    trade.sql_register(module=mod.name, include_private=True)
    assert spark.catalog.tableExists("prod__trade__internal__audit")


def test_partial_uncache_pins_survivors_against_source_mutation(spark, tmp_path):
    """The kept rows of a partial uncache must be MATERIALIZED before
    the old cache is released — recomputing them later from a mutated
    source would change pinned values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "src.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(1).write.parquet(p)
    db = NS.Database("pin")
    db.cache("t", spark.read.parquet(p))
    # source mutates AFTER caching — outside Spark's writer (whose
    # overwrite path triggers an automatic recache) like an external
    # producer would
    (part,) = [f for f in __import__("os").listdir(p) if f.endswith(".parquet")]
    pq.write_table(
        pa.table({"k": pa.array([1, 2], type=pa.int32()), "v": ["MUT", "MUT"]}),
        f"{p}/{part}",
    )
    db.uncache("t", F.col("k") == 1)
    got = {(r.k, r.v) for r in db.resolve("t").collect()}
    assert got == {(2, "b")}, got


# ------------------------------------------------- cached-query protocol
# (Kernel/README.md "Cached Query": index-keyed result caching with the
# "calculating" status whose re-entry is an error-stop, cover
# resolution across multiple indexes, uncovered values uncached)


def _qc_fixture(spark):
    """A parameterized 'grandparents' compute with an observable call
    counter."""
    parents = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("b", "d"), ("x", "y"), ("y", "z")],
        "parent string, child string",
    )
    calls = []

    def compute(**bound):
        calls.append(dict(bound))
        gp = parents.alias("p1").join(
            parents.alias("p2"), F.col("p1.child") == F.col("p2.parent")
        ).select(
            F.col("p1.parent").alias("grandParent"),
            F.col("p2.child").alias("grandChild"),
        )
        for c, v in bound.items():
            gp = gp.where(F.col(c) == F.lit(v))
        return gp

    return parents, compute, calls


def test_query_cache_hit_miss_and_pin(spark):
    """First submit computes + pins; second submit for the same index
    value is a pure cache hit (compute NOT re-invoked)."""
    _, compute, calls = _qc_fixture(spark)
    db = NS.Database("db")
    qc = db.cache_query("GrandParents", compute, indexes=[["grandParent"]])
    out1 = sorted(tuple(r) for r in qc.submit(grandParent="a").collect())
    assert out1 == [("a", "c"), ("a", "d")]
    assert len(calls) == 1
    out2 = sorted(tuple(r) for r in qc.submit(grandParent="a").collect())
    assert out2 == out1
    assert len(calls) == 1  # served from cache
    assert qc.stats == {"hits": 1, "misses": 1, "uncovered": 0}
    assert qc.status() == {(("grandParent",), ("a",)): "done"}
    # a different index value is its own entry
    assert [tuple(r) for r in qc.submit(grandParent="x").collect()] == [("x", "z")]
    assert len(calls) == 2


def test_query_cache_calculating_reentry_is_error_stop(spark):
    """'Adding an existing calculating index will cause an error
    (stop), which is not a failure' — e.g. a query recursive on the
    same index value. A DIFFERENT index value computed from inside is
    fine."""
    db = NS.Database("db")
    holder = {}

    def compute(**bound):
        if bound["k"] == 1:
            # recursive submit on the SAME index value -> stop
            holder["qc"].submit(k=1)
        return spark.range(1).select(F.lit(bound["k"]).alias("k"))

    holder["qc"] = db.cache_query("R", compute, indexes=[["k"]])
    with pytest.raises(NS.CacheCalculatingError, match="already calculating"):
        holder["qc"].submit(k=1)
    # the stop retracted the calculating mark: a non-recursive retry of
    # the key works (the stop is per-submission, not a poisoned entry)
    def compute2(**bound):
        return spark.range(1).select(F.lit(bound["k"]).alias("k"))

    qc2 = db.cache_query("R", compute2, indexes=[["k"]])
    assert qc2.submit(k=1).count() == 1


def test_query_cache_cover_resolution(spark):
    """Multiple indexes: a value set covered by several picks the
    cheapest CACHED cover first, else the most specific; residual
    bound columns filter the cached result; uncovered values compute
    directly and cache nothing."""
    _, compute, calls = _qc_fixture(spark)
    db = NS.Database("db")
    qc = db.cache_query(
        "GrandParents", compute,
        indexes=[["grandParent"], ["grandChild"], ["grandParent", "grandChild"]],
    )
    # both columns bound -> most specific cover (the pair index)
    assert [tuple(r) for r in qc.submit(grandParent="a", grandChild="c").collect()] == [("a", "c")]
    assert calls[-1] == {"grandParent": "a", "grandChild": "c"}
    # seed the single-column cover
    qc.submit(grandParent="a")
    n = len(calls)
    # pair value NOT cached for ('a','d') but grandParent='a' IS: the
    # cheapest CACHED cover wins — no recompute, residual filter applies
    got = [tuple(r) for r in qc.submit(grandParent="a", grandChild="d").collect()]
    assert got == [("a", "d")]
    assert len(calls) == n  # pure cache hit through the partial cover
    # uncovered: no declared index on a made-up column set
    qc2 = db.cache_query("G2", compute, indexes=[["grandChild"]])
    qc2.submit(grandParent="x")
    assert qc2.stats["uncovered"] == 1
    assert qc2.status() == {}  # nothing cached


def test_query_cache_invalidate(spark):
    _, compute, calls = _qc_fixture(spark)
    db = NS.Database("db")
    qc = db.cache_query("GrandParents", compute, indexes=[["grandParent"]])
    qc.submit(grandParent="a")
    qc.submit(grandParent="x")
    assert qc.invalidate(grandParent="a") == 1
    assert qc.status() == {(("grandParent",), ("x",)): "done"}
    qc.submit(grandParent="a")  # recomputes
    assert len(calls) == 3
    assert qc.invalidate() == 2
    assert qc.status() == {}
    # failed compute retracts the calculating mark (retriable)
    def boom(**bound):
        raise RuntimeError("source offline")

    qc3 = db.cache_query("G3", boom, indexes=[["k"]])
    with pytest.raises(RuntimeError, match="offline"):
        qc3.submit(k=1)
    assert qc3.status() == {}
