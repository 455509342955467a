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


def test_graph_motifs_oracle(spark, sf_dir, duck):
    res = compare(GX.graph_motifs(spark, sf_dir), GX.GRAPH_MOTIFS_SQL, duck)
    assert res["ok"], res


def test_kcore_converges_within_oracle_unroll_budget(spark):
    """The DuckDB oracle unrolls peeling to 10 rounds; the Spark side
    iterates to fixpoint. They agree iff peeling converges within 10
    rounds — assert that at every graded SF (a round past the fixpoint
    removes nothing, so fewer real rounds is always safe)."""
    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        edges = GE.undirected_sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
        rounds = 0
        while rounds <= 10:
            deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
            weak = deg.where(F.col("deg") < GX.KCORE_K).select("node").localCheckpoint(eager=True)
            if weak.isEmpty():
                break
            rounds += 1
            edges = (
                edges.join(weak.select(F.col("node").alias("src")), "src", "left_anti")
                .join(weak.select(F.col("node").alias("dst")), "dst", "left_anti")
                .localCheckpoint(eager=True)
            )
        assert rounds <= 10, f"{sf_dir}: peeling needed {rounds} rounds (> oracle unroll)"


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


def test_twophase_cc_equals_minlabel_on_trade_graph(spark, sf_dir):
    """Large-star/small-star contraction must produce exactly the
    min-label propagation components on the testdata graph."""
    from herodb_spark.graph import algorithms as GA
    from herodb_spark.graph import edges as GE

    und = GE.undirected_sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    two = sorted((r.node, r.comp) for r in GA.connected_components_twophase(und).collect())
    lab = sorted((r.node, r.comp) for r in GA.connected_components(und).collect())
    assert two == lab


def test_twophase_cc_converges_logarithmically_on_path_graph(spark):
    """The O(log n) claim, pinned: a 25-node path has diameter 24, so
    min-label propagation needs ~24 rounds — the star contraction must
    finish the same graph within 8 alternations or return wrong
    labels (max_iters caps the loop; no convergence = wrong comp)."""
    from pyspark.sql import functions as F

    from herodb_spark.graph.algorithms import connected_components_twophase

    edges = [(i, i + 1) for i in range(24)]
    df = spark.createDataFrame(edges, "src int, dst int")
    und = df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {(r.node, r.comp) for r in connected_components_twophase(und, max_iters=8).collect()}
    assert got == {(i, 0) for i in range(25)}


def test_adamic_adar_oracle(spark, sf_dir, duck):
    res = compare(GX.graph_adamic_adar(spark, sf_dir), GX.GRAPH_ADAMIC_ADAR_SQL, duck)
    assert res["ok"], res


def test_adamic_adar_agrees_with_common_neighbors(spark, sf_dir):
    """AA laws: same pair set as graph_common_neighbors (both gate on
    cn >= 2, non-adjacent, a<b), identical counts, every score > 0,
    and a pair can only outscore another with MORE common neighbors
    when its neighbors are lower degree (spot: score <= cn / ln(2))."""
    import math

    cn = {(r.a, r.b): r.common_neighbors
          for r in GX.graph_common_neighbors(spark, sf_dir).collect()}
    aa = {(r.a, r.b): (r.common_neighbors, r.adamic_adar)
          for r in GX.graph_adamic_adar(spark, sf_dir).collect()}
    assert set(cn) == set(aa)
    for k, (n, score) in aa.items():
        assert n == cn[k]
        assert 0 < score <= n / math.log(2) + 1e-9, (k, n, score)


def test_label_propagation_laws(spark, sf_dir):
    """LPA laws: deterministic across runs; every community label is
    a node id; same label ⇒ same connected component (LPA refines
    components); isolated behavior — a node keeps its own label when
    no neighbor majority displaces it (seed labels are node ids, so
    every label seen existed at round 0)."""
    from herodb_spark.graph.extra_algos import graph_label_propagation
    from herodb_spark.operators.graphops import graph_connected_components

    a = graph_label_propagation(spark, sf_dir).collect()
    b = graph_label_propagation(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    nodes = {r.node for r in a}
    assert {r.community for r in a} <= nodes
    comp = {r.node: r.comp for r in graph_connected_components(spark, sf_dir).collect()}
    by_lbl = {}
    for r in a:
        by_lbl.setdefault(r.community, set()).add(r.node)
    for lbl, members in by_lbl.items():
        comps = {comp[n] for n in members if n in comp}
        assert len(comps) <= 1, (lbl, comps)
