"""Property tests for the HeroQL compiler: randomized small programs
evaluated two ways — compiled to DataFrames vs a direct Python
set-semantics evaluator — must agree exactly.

The generators use program TEMPLATES with randomized data and
constants (joins, filters, negation, union cases, linear recursion)
rather than fully random ASTs: every draw exercises the compiler's
join/anti-join/fixpoint machinery on fresh data, while staying
shrinkable and fast enough for CI."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from herodb_spark.heroql import HeroQL

edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=0, max_size=14, unique=True,
)
labels = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 3)),
    min_size=0, max_size=8, unique_by=lambda t: t[0],
)

_SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _mk(spark_prop, e, lab):
    hql = HeroQL(spark_prop, max_iters=12)
    hql.register("E", spark_prop.createDataFrame(e or [(99, 99)], "a long, b long"))
    hql.register("L", spark_prop.createDataFrame(lab or [(99, 0)], "n long, c long"))
    if not e:
        hql.run("remove E(99, 99);")
    if not lab:
        hql.run("remove L(99, 0);")
    return hql


@given(e=edges, lab=labels, k=st.integers(0, 3))
@_SETTINGS
def test_join_filter_vs_python(spark_prop, e, lab, k):
    """E ⋈ L + comparison + arithmetic binding."""
    hql = _mk(spark_prop, e, lab)
    got = hql.run(f"""
        query (x, y, s) :- E(x, y), L(y, c), c >= {k}, s = x + c;
    """).queries[0]
    labmap = dict(lab)
    want = sorted(
        {(a, b, a + labmap[b]) for a, b in e if b in labmap and labmap[b] >= k}
    )
    assert sorted(tuple(r) for r in got.collect()) == want


@given(e=edges, lab=labels)
@_SETTINGS
def test_negation_vs_python(spark_prop, e, lab):
    """Labelled nodes with no outgoing edge (anti-join)."""
    hql = _mk(spark_prop, e, lab)
    got = hql.run("query (n, c) :- L(n, c), not E(n, _);").queries[0]
    srcs = {a for a, _ in e}
    want = sorted({(n, c) for n, c in lab if n not in srcs})
    assert sorted(tuple(r) for r in got.collect()) == want


@given(e=edges)
@_SETTINGS
def test_union_cases_vs_python(spark_prop, e):
    """Two rule cases union with set semantics."""
    hql = _mk(spark_prop, e, [])
    hql.run("""
        data Touch(n : int);
        Touch(a) :- E(a, _);
        Touch(b) :- E(_, b);
    """)
    got = hql.table("Touch")
    want = sorted({(a,) for a, _ in e} | {(b,) for _, b in e})
    assert sorted(tuple(r) for r in got.collect()) == want


def _closure(e):
    reach = set(e)
    while True:
        new = {(x, z) for x, y in reach for y2, z in e if y == y2} - reach
        if not new:
            return reach
        reach |= new


@given(e=edges)
@_SETTINGS
def test_linear_recursion_vs_python(spark_prop, e):
    """Transitive closure through the semi-naive path == Python
    fixpoint (8 nodes → ≤7 frontier rounds < max_iters)."""
    hql = _mk(spark_prop, e, [])
    got = hql.run("""
        data Reach(x : int, y : int);
        Reach(x, y) :- E(x, y);
        Reach(x, z) :- Reach(x, y), E(y, z);
        query (x, y) :- Reach(x, y);
    """).queries[0]
    assert sorted(tuple(r) for r in got.collect()) == sorted(_closure(e))


@given(lab=labels, lo=st.integers(0, 2), hi=st.integers(1, 3))
@_SETTINGS
def test_update_remove_vs_python(spark_prop, lab, lo, hi):
    """update-then-remove pipeline == Python dict transform."""
    hql = _mk(spark_prop, [], lab)
    hql.run(f"""
        update L(n, c) :- c >= {lo}, c = c * 10;
        remove L(n, c) :- c > {hi * 10};
    """)
    got = sorted(tuple(r) for r in hql.table("L").collect())
    want = sorted(
        (n, v)
        for n, c in lab
        for v in [c * 10 if c >= lo else c]
        if not v > hi * 10
    )
    assert got == want


# ---------------------------------------------------------------------------
# parser robustness: arbitrary input must either parse or raise
# HeroQLSyntaxError — never an internal IndexError/KeyError/loop
# ---------------------------------------------------------------------------

from herodb_spark.heroql.parser import HeroQLSyntaxError, parse

_fragments = st.sampled_from([
    "data", "query", ":-", "(", ")", "{", "}", ";", ",", "::", "..",
    "T", "x", "1", "1.5", '"s"', "==", "=", "not", "exists", "if",
    "then", "else", "partition_by", "group_by", "set", "update",
    "func", "case", "namespace", "using", "|", "*", "_", "index",
])


@settings(max_examples=200, deadline=None)
@given(st.lists(_fragments, max_size=12).map(" ".join))
def test_parser_never_crashes_on_token_soup(src):
    try:
        parse(src)
    except HeroQLSyntaxError:
        pass  # the only acceptable failure mode


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_parser_never_crashes_on_arbitrary_text(src):
    try:
        parse(src)
    except HeroQLSyntaxError:
        pass
