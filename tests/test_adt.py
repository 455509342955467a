"""ADT term-table and class-hierarchy operators (draft_type surfaces)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from herodb_spark.operators import adt as ADT
from tests.harness import compare

ORACLE_CASES = [
    (ADT.adt_list_ops, ADT.ADT_LIST_OPS_SQL),
    (ADT.class_hierarchy, ADT.CLASS_HIERARCHY_SQL),
]


@pytest.mark.parametrize("fn,sql", ORACLE_CASES, ids=[f.__name__ for f, _ in ORACLE_CASES])
def test_adt_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_list_terms_tagged_union_shape(spark, sf_dir):
    """Term table invariants: every region has exactly one 'empty'
    terminal; every 'cons' next pointer resolves to a row; chains are
    NULL-free in value."""
    terms = ADT.list_terms(spark, sf_dir).cache()
    empties = terms.where(F.col("tag") == "empty")
    assert empties.groupBy("region").count().where(F.col("count") != 1).isEmpty()
    ids = {r.node_id for r in terms.select("node_id").collect()}
    for r in terms.where(F.col("tag") == "cons").collect():
        assert r.next_id in ids, f"dangling pointer {r.next_id}"
        assert r.value is not None
    terms.unpersist()


def test_reverse_is_involution(spark, sf_dir):
    """reverse(reverse(list)) == flatten(list): applying the position
    flip twice restores the original order — the draft's reverse_
    accumulator semantics."""
    flat = ADT._flatten_lists(ADT.list_terms(spark, sf_dir))
    rows = flat.collect()
    by_region: dict[int, dict[int, int]] = {}
    for r in rows:
        by_region.setdefault(r.region, {})[r.pos] = r.value
    out = ADT.adt_list_ops(spark, sf_dir).collect()
    rev = [r for r in out if r.op == "reverse"]
    for r in rev:
        orig = by_region[r.k]
        assert r.value == orig[len(orig) - 1 - r.pos]


def test_concat_is_append(spark, sf_dir):
    """concat a b = a ++ b (draft_type:15 via the double-reverse
    identity): lengths add and order is a-then-b."""
    flat = ADT._flatten_lists(ADT.list_terms(spark, sf_dir))
    by_region: dict[int, list[int]] = {}
    for r in flat.collect():
        by_region.setdefault(r.region, []).append((r.pos, r.value))
    out = ADT.adt_list_ops(spark, sf_dir).collect()
    concat: dict[int, dict[int, int]] = {}
    for r in out:
        if r.op == "concat":
            concat.setdefault(r.k, {})[r.pos] = r.value
    for k, got in concat.items():
        a = [v for _, v in sorted(by_region[k])]
        b = [v for _, v in sorted(by_region[k + 1])]
        want = a + b
        assert [got[i] for i in range(len(want))] == want


def test_subtype_closure_expression(spark):
    subs = {
        (r.cls, r.depth) for r in ADT.subtype_closure(spark, "Expression").collect()
    }
    assert subs == {
        ("Expression", 0),
        ("NumExpr", 1),
        ("RefExpr", 1),
        ("LambdaExpr", 1),
        ("ApplyExpr", 1),
        ("MatchExpr", 1),
    }


def test_subtype_closure_node_is_whole_hierarchy(spark):
    subs = {r.cls for r in ADT.subtype_closure(spark, "Node").collect()}
    assert subs == {"Node"} | {c for c, _ in ADT.CLASS_EDGES}
    depths = {r.cls: r.depth for r in ADT.subtype_closure(spark, "Node").collect()}
    assert depths["RefType"] == 2 and depths["DataDecl"] == 2 and depths["Type"] == 1


def test_class_hierarchy_field_dispatch(spark, sf_dir):
    """Shared-prefix fields dispatch by subtype: only RefExpr /
    LambdaExpr rows carry `name`, only NumExpr carries `number`."""
    inst = ADT.ast_instances(spark, sf_dir)
    bad_name = inst.where(
        F.col("name").isNotNull() & ~F.col("kind").isin("RefExpr", "LambdaExpr")
    )
    bad_num = inst.where(F.col("number").isNotNull() & (F.col("kind") != "NumExpr"))
    assert bad_name.isEmpty() and bad_num.isEmpty()
    out = {r.cls: r for r in ADT.class_hierarchy(spark, sf_dir).collect()}
    assert set(out) == set(ADT._EXPR_KINDS)
    for cls, r in out.items():
        assert r.depth == 1
        if cls not in ("RefExpr", "LambdaExpr"):
            assert r.n_named == 0
        if cls != "NumExpr":
            assert r.sum_number == 0


def test_list_length_within_traversal_bound(spark):
    """adt_list_ops truncates silently if a region chain ever exceeds
    MAX_LIST_LEN while the SQL oracle walks unbounded — pin the data
    assumption the bound rests on at both unit SFs."""
    from pyspark.sql import functions as F

    from herodb_spark.operators.adt import MAX_LIST_LEN, list_terms

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        longest = (
            list_terms(spark, sf)
            .where(F.col("tag") == "cons")
            .groupBy("region")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert longest < MAX_LIST_LEN, (sf, longest)
