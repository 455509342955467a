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
