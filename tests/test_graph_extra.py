from __future__ import annotations

from pyspark.sql import functions as F

from herodb_spark.graph import extra_algos as GX
from herodb_spark.graph import edges as GE
from tests.harness import compare


def test_common_neighbors_oracle(spark, sf_dir, duck):
    res = compare(
        GX.graph_common_neighbors(spark, sf_dir), GX.GRAPH_COMMON_NEIGHBORS_SQL, duck
    )
    assert res["ok"], res


def test_kcore_invariant(spark, sf_dir):
    """Every node in the k-core has ≥ k neighbors inside the core."""
    core = GX.graph_kcore(spark, sf_dir)
    rows = core.collect()
    assert all(r.core_degree >= GX.KCORE_K for r in rows), rows
    # and the core is closed: recompute degrees of the returned node
    # set over the original graph restricted to it
    nodes = {r.node for r in rows}
    und = GE.undirected_sparse_edges(spark, sf_dir).collect()
    inside = {}
    for e in und:
        if e.src in nodes and e.dst in nodes:
            inside[e.src] = inside.get(e.src, 0) + 1
    for n in nodes:
        assert inside.get(n, 0) >= GX.KCORE_K, (n, inside.get(n, 0))
