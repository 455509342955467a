"""Graph operators wired to the nation trade graph, with recursive-CTE
DuckDB oracles. Seed node for traversals: nation 0."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.graph import algorithms as GA
from herodb_spark.graph import edges as GE

SEED = 0


def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = GE.nation_trade_edges(spark, sf_dir)
    return GA.degrees(e).orderBy("node")


GRAPH_DEGREE_SQL = (
    "WITH "
    + GE.EDGES_SQL
    + """
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(o.out_deg, 0) AS out_deg,
       COALESCE(i.in_deg, 0) AS in_deg,
       COALESCE(o.out_w, 0) AS out_w,
       COALESCE(i.in_w, 0) AS in_w
FROM (SELECT src AS node, COUNT(*) AS out_deg, SUM(w) AS out_w FROM edges GROUP BY src) o
FULL OUTER JOIN (SELECT dst AS node, COUNT(*) AS in_deg, SUM(w) AS in_w FROM edges GROUP BY dst) i
  ON o.node = i.node
ORDER BY node
"""
)


def graph_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = GE.sparse_edges(spark, sf_dir)
    return GA.two_hop_counts(e).orderBy("node")


GRAPH_TWO_HOP_SQL = (
    "WITH "
    + GE.SPARSE_SQL
    + """
, reach AS (
  SELECT src AS node, dst AS reach FROM sparse
  UNION
  SELECT a.src AS node, b.dst AS reach FROM sparse a JOIN sparse b ON a.dst = b.src
)
SELECT node, COUNT(*) AS n_reachable_2hop
FROM reach WHERE node <> reach GROUP BY node ORDER BY node
"""
)


def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the 75-row edge table once; BFS iterations must not
    # recompute the 4-table derivation join per hop
    e = GE.sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    return GA.reachable_set(e, SEED).orderBy("node")


GRAPH_REACHABILITY_SQL = (
    "WITH RECURSIVE "
    + GE.SPARSE_SQL
    + f"""
, r(node) AS (
  SELECT {SEED}
  UNION
  SELECT s.dst FROM sparse s, r WHERE s.src = r.node
)
SELECT node FROM r ORDER BY node
"""
)


def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = GE.sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    return GA.shortest_hops(e, SEED).orderBy("node")


GRAPH_SHORTEST_HOPS_SQL = (
    "WITH RECURSIVE "
    + GE.SPARSE_SQL
    + f"""
, p(node, hops) AS (
  SELECT {SEED}, 0
  UNION ALL
  SELECT s.dst, p.hops + 1 FROM sparse s, p WHERE s.src = p.node AND p.hops < 8
)
SELECT node, CAST(MIN(hops) AS INT) AS hops FROM p GROUP BY node ORDER BY node
"""
)


def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = GE.undirected_sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    return GA.connected_components(e).orderBy("node")


GRAPH_CC_SQL = (
    "WITH RECURSIVE "
    + GE.UNDIRECTED_SQL
    + """
, r(start, node) AS (
  SELECT src, src FROM undirected
  UNION
  SELECT r.start, u.dst FROM undirected u, r WHERE u.src = r.node
)
SELECT start AS node, MIN(node) AS comp FROM r GROUP BY start ORDER BY node
"""
)


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three-way self-join: materialize once instead of recomputing the
    # edge derivation per join branch
    e = GE.undirected_sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    return GA.triangle_count(e)


GRAPH_TRIANGLES_SQL = (
    "WITH "
    + GE.UNDIRECTED_SQL
    + """
, canon AS (SELECT DISTINCT src, dst FROM undirected WHERE src < dst)
SELECT COUNT(*) AS n_triangles
FROM canon ab
JOIN canon bc ON ab.dst = bc.src
JOIN canon ac ON ac.src = ab.src AND ac.dst = bc.dst
"""
)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-iteration PageRank over the sparse trade graph; all 25
    nations as the node set. Rows-only driver check — per-iteration
    normalization isn't expressible in a recursive CTE — invariants
    (sum of ranks = 1, determinism) are pinned in tests."""
    from herodb_spark.catalog import load_table

    nodes = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("node")).localCheckpoint(eager=True)
    e = GE.sparse_edges(spark, sf_dir).localCheckpoint(eager=True)
    return GA.pagerank(nodes, e, iters=10).orderBy("node")
