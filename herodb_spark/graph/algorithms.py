"""Analytical graph algorithms as iterative DataFrame programs.

The reference's graph storage (`data class` relations,
Kernel/Drafts/draft:173-175, draft_students) implies traversal /
closure / ranking queries; BASELINE.json picks "GraphX for analytical
queries" as the Spark approach. GraphX is Scala/RDD-only, so we use
its *algorithm shapes* (Pregel-style iteration: message = join on
edges, combine = groupBy) over DataFrames — this keeps Catalyst, AQE,
and whole-stage codegen in the loop, which is the idiomatic PySpark
path at scale.

Scale notes:
- Each iteration = one shuffle keyed on src/dst. `localCheckpoint()`
  every iteration truncates lineage so plan size / replanning stays
  O(1) in iteration count (the classic iterative-DataFrame trap).
- Frontier-based BFS keeps per-iteration work proportional to the
  frontier, not the graph.
- Connected components here is min-label propagation (diameter-bounded
  iterations). For 100 TB graphs swap in the two-phase
  large-star/small-star contraction — same DataFrame machinery, fewer
  rounds; the operator signature doesn't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 30


def degrees(edges: DataFrame) -> DataFrame:
    """In/out degree + weight per node from a weighted edge list."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("w").alias("out_w")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("w").alias("in_w")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_w", F.lit(0)).alias("out_w"),
            F.coalesce("in_w", F.lit(0)).alias("in_w"),
        )
    )


def two_hop_counts(edges: DataFrame) -> DataFrame:
    """Per node: count of distinct nodes reachable in ≤ 2 hops
    (excluding self)."""
    e1 = edges.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    e2 = edges.select(F.col("src").alias("mid"), F.col("dst").alias("far"))
    one = e1.select("node", F.col("mid").alias("reach"))
    two = e1.join(e2, "mid").select("node", F.col("far").alias("reach"))
    return (
        one.unionByName(two)
        .where(F.col("node") != F.col("reach"))
        .distinct()
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_reachable_2hop"))
    )


def shortest_hops(edges: DataFrame, seed: int, max_iters: int = MAX_ITERS) -> DataFrame:
    """BFS min-hop distances from `seed`. Frontier-based: iteration i
    joins only the new frontier against edges."""
    spark = edges.sparkSession
    visited = spark.createDataFrame([(seed, 0)], "node int, hops int")
    visited = visited.withColumn("node", F.col("node").cast(dict(edges.dtypes)["src"]))
    frontier = visited
    for i in range(1, max_iters + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(i).alias("hops"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def reachable_set(edges: DataFrame, seed: int, max_iters: int = MAX_ITERS) -> DataFrame:
    """Transitive closure from `seed` (the recursive-rule analog,
    reference draft:80-100 Fib / recursive cases)."""
    return shortest_hops(edges, seed, max_iters).select("node")


def connected_components(undirected: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """Min-label propagation over a symmetric edge list until
    fixpoint: comp(v) = min node id in v's component."""
    labels = (
        undirected.select(F.col("src").alias("node"))
        .unionByName(undirected.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            undirected.join(labels, undirected.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least(F.col("comp"), F.coalesce("n_comp", F.col("comp"))).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
        )
        labels = new_labels
        if changed.isEmpty():
            break
    return labels


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 10, damping: float = 0.85) -> DataFrame:
    """Uniform-transition PageRank with dangling-mass redistribution.
    `nodes`: single column `node`; `edges`: src,dst (unweighted)."""
    n = nodes.count()
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    # Dangling topology is static — decide ONCE whether the per-
    # iteration dangling-mass aggregation is needed instead of paying
    # a driver round-trip every iteration.
    has_dangling = not nodes.join(out_deg, "node", "left_anti").isEmpty()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(iters):
        with_deg = ranks.join(out_deg, "node", "left")
        contribs = (
            with_deg.where(F.col("deg").isNotNull())
            .join(edges, F.col("node") == edges.src)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        incoming = F.coalesce(F.col("c"), F.lit(0.0))
        if has_dangling:
            # dangling mass as a broadcast 1-row DataFrame crossJoined
            # into the update — the whole iteration stays lazy (no
            # per-iteration driver round-trip; round-1 weak spot #5)
            dang = with_deg.where(F.col("deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
            ranks = (
                nodes.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping) * (incoming + F.col("_dang") / F.lit(float(n)))
                    ).alias("rank"),
                )
            )
        else:
            ranks = nodes.join(contribs, "node", "left").select(
                "node",
                (F.lit(base) + F.lit(damping) * incoming).alias("rank"),
            )
        # checkpoint every 3rd iteration: enough to keep the plan
        # bounded without one materialization job per iteration
        if i % 3 == 2 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_count(undirected: DataFrame) -> DataFrame:
    """Total triangle count on a symmetric edge list: canonical a<b<c
    three-way join."""
    canon = undirected.where(F.col("src") < F.col("dst")).select("src", "dst").distinct()
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return ab.join(bc, "b").join(ac, ["a", "c"]).agg(F.count(F.lit(1)).alias("n_triangles"))
