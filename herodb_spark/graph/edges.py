"""Edge-table builders: herodb's `data class` relation fields
(`parents * children : Person, n..n` — Kernel/Drafts/draft:33-40,
draft_students:23-24) are edge tables in the relational model. We
derive a trade graph from the TPC-H-ish tables:

  nation --(w = #order-lines customer→supplier)--> nation

and a sparse top-3-out-edges subgraph for traversal operators.
Everything is a DataFrame; the builders are reused by every graph
operator and by their DuckDB oracles (same SQL shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table


def nation_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted edges src_nation → dst_nation. The heavy
    lifting is the fact-table join (lineitem⋈orders shuffles on
    orderkey; customer/supplier AQE-sized); the result is tiny."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # note: pre-aggregating lineitem to (orderkey, supplier-nation)
    # counts before the orderkey shuffle was measured and REJECTED —
    # distinct supplier nations per order ≈ lines per order here, so
    # almost nothing collapses and the extra aggregation stage costs
    # more than the shuffled bytes it saves
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


EDGES_SQL = """
li_supp AS MATERIALIZED (
  SELECT l_orderkey, s_nationkey FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
),
ord_cust AS MATERIALIZED (
  SELECT o_orderkey, c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
),
edges AS MATERIALIZED (
  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
  FROM li_supp JOIN ord_cust ON l_orderkey = o_orderkey
  WHERE c_nationkey <> s_nationkey
  GROUP BY c_nationkey, s_nationkey
)
"""


def sparse_weighted_edges(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """Top-3 outgoing edges per src (by weight desc, dst asc),
    keeping the weight — THE deterministic bounded-out-degree
    subgraph; the unweighted variant projects from it so the bound and
    tie-break live in exactly one place. Pass `base` (a materialized
    nation_trade_edges) to reuse one fact-join derivation across
    several graph operators in a merged query."""
    e = base if base is not None else nation_trade_edges(spark, sf_dir)
    w = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    return e.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3).select("src", "dst", "w")


def sparse_edges(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """Unweighted projection of `sparse_weighted_edges`."""
    return sparse_weighted_edges(spark, sf_dir, base).select("src", "dst")


# one shared top-3 fragment; the unweighted CTE projects from it
SPARSE_W_SQL = (
    EDGES_SQL
    + """,
sparse_w AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT src, dst, w, ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS rk
    FROM edges
  ) WHERE rk <= 3
)
"""
)

SPARSE_SQL = (
    SPARSE_W_SQL
    + """,
sparse AS MATERIALIZED (
  SELECT src, dst FROM sparse_w
)
"""
)


def undirected_sparse_edges(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """Symmetric closure of the sparse graph (for components /
    triangles)."""
    e = sparse_edges(spark, sf_dir, base)
    return (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


UNDIRECTED_SQL = (
    SPARSE_SQL
    + """,
undirected AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM sparse UNION ALL SELECT dst AS src, src AS dst FROM sparse
  )
)
"""
)
