from __future__ import annotations

import pytest

from herodb_spark.operators import graphops as G
from tests.harness import compare

ORACLE_CASES = [
    (G.graph_degree, G.GRAPH_DEGREE_SQL),
    (G.graph_two_hop, G.GRAPH_TWO_HOP_SQL),
    (G.graph_reachability, G.GRAPH_REACHABILITY_SQL),
    (G.graph_shortest_hops, G.GRAPH_SHORTEST_HOPS_SQL),
    (G.graph_connected_components, G.GRAPH_CC_SQL),
    (G.graph_triangles, G.GRAPH_TRIANGLES_SQL),
    (G.graph_personalized_pagerank, G.GRAPH_PPR_SQL),
]


@pytest.mark.parametrize("fn,sql", ORACLE_CASES, ids=[f.__name__ for f, _ in ORACLE_CASES])
def test_graph_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_pagerank_invariants(spark, sf_dir):
    rows = G.graph_pagerank(spark, sf_dir).collect()
    assert len(rows) == 25
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-3, total
    assert all(r.rank > 0 for r in rows)


def test_shortest_hops_converges_within_pinned_bound(spark, sf_dir):
    """Both engines pin HOPS_BOUND; BFS must reach every node within
    it at the test SFs (otherwise the bound itself is stale and both
    sides silently truncate)."""
    from herodb_spark.graph import algorithms as GA
    from herodb_spark.graph import edges as GE
    from herodb_spark.operators.graphops import HOPS_BOUND, SEED

    e = GE.sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    bounded = sorted(tuple(r) for r in GA.shortest_hops(e, SEED, max_iters=HOPS_BOUND).collect())
    free = sorted(tuple(r) for r in GA.shortest_hops(e, SEED, max_iters=30).collect())
    assert bounded == free


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iters without a fixpoint must fail loudly —
    silently returning a half-propagated labeling hands several comp
    ids to one true component."""
    import pytest

    from herodb_spark.graph.algorithms import connected_components
    from herodb_spark.session import literal_df

    chain = literal_df(spark, [(i, i + 1) for i in range(12)], "src long, dst long")
    sym = chain.unionByName(chain.selectExpr("dst AS src", "src AS dst"))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(sym, max_iters=3)


def test_personalized_pagerank_invariants(spark, sf_dir):
    """PPR laws: mass sums to ~1 (teleport conserves it), the seed
    carries the largest score, every node reachable from the seed
    scores > 0, every unreachable non-seed scores EXACTLY 0.0 (the
    support contract the graph_seed_paths union relies on), and
    plain pagerank is recovered when pref is uniform (spot-checked by
    the separate graded operator)."""
    rows = {r.node: r.ppr for r in G.graph_personalized_pagerank(spark, sf_dir).collect()}
    assert len(rows) == 25
    assert abs(sum(rows.values()) - 1.0) < 1e-3
    assert rows[G.SEED] == max(rows.values())
    reach = {r.node for r in G.graph_reachability(spark, sf_dir).collect()}
    for node, ppr in rows.items():
        if node in reach or node == G.SEED:
            assert ppr > 0.0, node
        else:
            assert ppr == 0.0, (node, ppr)
