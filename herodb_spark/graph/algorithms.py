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
- Connected components: `connected_components` is min-label
  propagation (diameter-bounded rounds, the simple baseline);
  `connected_components_twophase` is the large-star/small-star
  contraction (O(log n) rounds) — the 100-TB path and the one the
  registered operator runs. Same signature, property-tested equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 30


# the shared observe-on-checkpoint probe lives in session.py (public,
# one definition — r13 ADVICE); kept under the old name for this
# module's call sites
from herodb_spark.session import ckpt_count as _ckpt_count  # noqa: E402


def closure(step, init: DataFrame, key: list[str], max_iters: int = MAX_ITERS,
            probe_every: int | None = 1, dedup_new: bool = True,
            subtract_state: bool = True) -> DataFrame:
    """General bounded recursion, accumulate form — the reusable
    operator behind the reference's parameterized recursive rules
    (Kernel/Drafts/draft:77-89 `func Fib(...); case ... :- Fib(a-1,x),
    Fib(a-2,y)`): semi-naive datalog evaluation.

        state₀ = init;  Δ₀ = init
        Δᵢ₊₁  = step(Δᵢ) \\ state (on `key`);  state += Δᵢ₊₁

    `step` sees only the latest delta, so per-iteration work scales
    with the frontier, not the accumulated state — the property that
    makes closure viable on 100-TB fact tables. `step` must emit at
    most one row per `key` within an iteration (BFS frontiers, tree
    expansion, and linear recurrences all satisfy this).

    With the anti-join on (the general case — cyclic or re-deriving
    rules), every delta AND the state are localCheckpoint'ed per
    iteration: the anti-join references the state, so unmaterialized
    lineage would nest the whole history into each plan (exponential
    blowup). Two blocking jobs per shuffle round — the right trade
    when a step moves real data.

    `subtract_state=False` declares the rule MONOTONE-ACYCLIC (a step
    never re-derives a key from an earlier iteration — linear
    recurrences, tree expansion); the anti-join is then skipped, which
    breaks the delta's dependence on the accumulated state and lets
    `probe_every` batch several steps into one blocking job (40 tiny
    steps shouldn't cost 40 job launches; segment lineage truncates at
    each probe's checkpoint, and overshooting past the fixpoint is
    harmless — empty frontiers derive nothing). probe_every=None runs
    all max_iters steps in one fully-lazy plan — right when the
    iteration count is statically known. `dedup_new=False`
    additionally declares a step emits unique keys, skipping the
    per-step shuffle. Keep tiny inits on ONE partition (coalesce):
    every delta inherits the init's partitioning, and a 1-row
    recurrence spread over 8 partitions turns the final union into
    hundreds of empty tasks."""
    state = init.localCheckpoint(eager=True)
    frontier = state
    for i in range(1, max_iters + 1):
        new = step(frontier)
        if dedup_new:
            new = new.dropDuplicates(key)
        if subtract_state:
            new = new.join(state.select(*key), key, "left_anti")
            # the emptiness probe rides the checkpoint job (r13 opt:
            # no separate isEmpty job per iteration)
            new, n_new = _ckpt_count(new)
            if n_new == 0:
                break
            state = state.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        else:
            probe = probe_every is not None and (i % probe_every == 0 or i == max_iters)
            if probe:
                # checkpoint the delta BEFORE unioning it into the
                # state: the state then references the materialized
                # segment instead of holding a lazy twin of the plan
                # the probe already computed (which would re-run every
                # segment once more at final evaluation); the
                # emptiness probe rides the checkpoint job (r13 opt)
                new, n_new = _ckpt_count(new)
            state = state.unionByName(new)
            frontier = new
            if probe and n_new == 0:
                break
    return state


def fixpoint(step, init: DataFrame, max_iters: int = MAX_ITERS,
             probe_change: bool = True) -> DataFrame:
    """General bounded recursion, re-aggregate form: iterate a
    full-state transformer `state ← step(state)` until the state stops
    changing (set equality) or `max_iters` is reached. Covers
    iterations that REVISE rows (Bellman-Ford relaxation, label
    propagation, peeling) rather than only adding them — the other
    half of the reference's recursive-rule surface (draft:77-89).
    Change detection is two anti-join emptiness probes per round; each
    round is checkpointed so lineage stays bounded.

    `probe_change=False` declares the iteration STATICALLY BOUNDED
    (the caller pins max_iters and extra rounds past convergence are
    idempotent — e.g. a k-round Bellman-Ford whose oracle unrolls the
    same k rounds): the probe jobs per round are skipped, leaving
    one blocking checkpoint per round.

    Change detection (r13 opt): the row count rides each round's
    checkpoint job; a count change IS a change (zero probe jobs), and
    at equal counts ONE exceptAll suffices — for multisets with
    |A| = |B|, A∖B = ∅ implies B∖A = ∅ (|A∖B| = |A| − |A∩B|). The old
    shape paid two exceptAll probes every round."""
    if not probe_change:
        state = init.localCheckpoint(eager=True)
        for _ in range(max_iters):
            state = step(state).localCheckpoint(eager=True)
        return state
    state, n_state = _ckpt_count(init)
    for _ in range(max_iters):
        new, n_new = _ckpt_count(step(state))
        changed = n_new != n_state or not new.exceptAll(state).isEmpty()
        state, n_state = new, n_new
        if not changed:
            break
    return state


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
    """BFS min-hop distances from `seed`, expressed through the
    general `closure` operator: the frontier-only step keeps
    per-iteration work proportional to the frontier, and the
    semi-naive anti-join assigns each node the hop count of its FIRST
    discovery — i.e. the minimum."""
    from herodb_spark.session import literal_df

    spark = edges.sparkSession
    init = literal_df(spark, [(seed, 0)], "node int, hops int").withColumn(
        "node", F.col("node").cast(dict(edges.dtypes)["src"])
    )

    def step(frontier: DataFrame) -> DataFrame:
        return (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )

    return closure(step, init, key=["node"], max_iters=max_iters)


def reachable_set(edges: DataFrame, seed: int, max_iters: int = MAX_ITERS) -> DataFrame:
    """Transitive closure from `seed` (the recursive-rule analog,
    reference draft:80-100 Fib / recursive cases)."""
    return shortest_hops(edges, seed, max_iters).select("node")


def connected_components(undirected: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """Min-label propagation over a symmetric edge list until
    fixpoint: comp(v) = min node id in v's component.

    Convergence (r13 opt): each node's comp is monotonically
    NON-INCREASING under least(), and the node set is fixed, so
    Σ comp is strictly smaller after any change and equal iff NO
    label changed — an exact test that rides the checkpoint job as an
    observed DECIMAL(38,0) sum (overflow-proof for any long ids),
    replacing the per-round change-join probe job."""

    def _ckpt_sum(df: DataFrame) -> tuple[DataFrame, object]:
        from pyspark.sql import Observation

        obs = Observation()
        out = df.observe(
            obs, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint(eager=True)
        return out, obs.get["s"]

    labels, prev_sum = _ckpt_sum(
        undirected.select(F.col("src").alias("node"))
        .unionByName(undirected.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            undirected.join(labels, undirected.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels, new_sum = _ckpt_sum(
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least(F.col("comp"), F.coalesce("n_comp", F.col("comp"))).alias("comp"))
        )
        labels, changed = new_labels, new_sum != prev_sum
        prev_sum = new_sum
        if not changed:
            converged = True
            break
    if not converged:
        # silently returning a half-propagated labeling would hand
        # multiple comp ids to one true component — fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters; raise it or use "
            "connected_components_twophase)"
        )
    return labels


def connected_components_twophase(undirected: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14): converges in O(log n) rounds regardless of
    graph diameter — the 100-TB replacement for min-label propagation
    (O(diameter) rounds). Same output contract as
    `connected_components`: (node, comp) with comp = min node id in
    the component; equality with min-label is property-tested on the
    testdata graphs and on random graphs.

    Each round is two groupBy-join steps over the current edge set:
      large-star(u): connect every neighbor v > u to
        m = min(Γ(u) ∪ {u});
      small-star(u): connect every neighbor v ≤ u (and u itself) to
        that minimum.
    Edges come out canonical (child > parent); at the fixpoint every
    component is a star centered on its minimum, read off directly.
    All shuffles key on node ids — no driver state, and each
    contraction strictly shrinks long chains, which is what bounds the
    round count logarithmically."""
    # materialize the INPUT once: orig_nodes and edges both derive
    # from it, and with an expensive upstream (e.g. the MinHash-LSH
    # pair miner feeding dedup_cluster_canonical) two independent
    # eager checkpoints would compute that whole DAG twice
    undirected = undirected.localCheckpoint(eager=True)
    orig_nodes = (
        undirected.select(F.col("src").alias("node"))
        .unionByName(undirected.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges, n_edges = _ckpt_count(
        undirected.where(F.col("src") != F.col("dst"))
        .select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
        .distinct()
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    def _mins(view: DataFrame) -> DataFrame:
        # m(u) = min(neighbors-in-view ∪ {u})
        return view.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )

    done = False
    for _ in range(max_iters):
        # large-star: from the full symmetric view, point every
        # strictly larger neighbor at u's minimum. Kept as an eager
        # checkpoint: the small-star step references ls TWICE via the
        # symmetric union, and ReuseExchange does not dedupe the
        # doubled subtree in the initial plan (verified r13-opt:
        # 0 ReusedExchange nodes, 44 Exchanges in the fused round) —
        # fusing would double both the planning tree and, absent AQE
        # runtime stage reuse, the large-star compute.
        sym = _sym(edges)
        m = _mins(sym)
        ls = (
            sym.join(m, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: only the ≤ side of the symmetric view; point u
        # and its small neighbors at the minimum
        dirn = _sym(ls).where(F.col("dst") <= F.col("src"))
        m2 = _mins(dirn)
        # the |ss| probe rides the checkpoint job (r13 opt: no count
        # job per round); set equality as |A| == |B| ∧ A ⊆ B (multiset
        # containment via exceptAll) — the exceptAll shuffle only runs
        # when the observed counts match
        ss, n_ss = _ckpt_count(
            dirn.join(m2, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(m2.select(F.col("src"), F.col("m").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        converged = n_ss == n_edges and ss.exceptAll(edges).isEmpty()
        edges, n_edges = ss, n_ss
        if converged:
            done = True
            break
    if not done:
        # the final read-off assumes a star fixpoint; a premature exit
        # would fan out the left join into duplicate (node, comp) rows
        raise RuntimeError(
            f"connected_components_twophase did not converge in {max_iters} "
            "rounds (O(log n) expected — this indicates a bug or an "
            "adversarial graph; raise max_iters)"
        )
    # at the star fixpoint each child points directly at its root
    return orig_nodes.join(
        edges.select(F.col("src").alias("node"), F.col("dst").alias("root")), "node", "left"
    ).select("node", F.coalesce("root", F.col("node")).alias("comp"))


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 10, damping: float = 0.85,
             checkpoint_every: int = 5) -> DataFrame:
    """Uniform-transition PageRank with dangling-mass redistribution.
    `nodes`: single column `node`; `edges`: src,dst (unweighted).
    `checkpoint_every` sets the localCheckpoint cadence (see the
    comment at the loop tail; sweep results in BASELINE.md)."""
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    # Dangling topology is static — decide ONCE whether the per-
    # iteration dangling-mass aggregation is needed instead of paying
    # a driver round-trip every iteration. ONE setup job computes both
    # |nodes| and the dangling count (r13 opt: was a count job plus an
    # anti-join emptiness job).
    setup = nodes.join(out_deg, "node", "left").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("deg").isNull(), 1).otherwise(0)).alias("n_dang"),
    ).first()
    n = setup["n"]
    has_dangling = bool(setup["n_dang"])
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
        # checkpoint every `checkpoint_every` iterations: enough to
        # keep the plan bounded without one materialization job per
        # iteration (each blocking job costs a full scheduler
        # round-trip; at 10 iterations the cadence-3 version spent
        # more wall-clock on the extra jobs than the longer lazy
        # segments cost). Cadence swept at sf0.1 median-of-5 in
        # round 5 — see BASELINE.md.
        if i % checkpoint_every == checkpoint_every - 1 or i == iters - 1:
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


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: list[int],
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PERSONALIZED PageRank: the teleport distribution concentrates
    on `seeds` (uniform over them) instead of all nodes — the random
    walker restarts at the seed set, so scores measure proximity TO
    THE SEEDS (the recsys/similar-items staple; plain `pagerank` is
    the pref≡1/n special case). Dangling mass also teleports to the
    seed distribution. Same iteration scaffolding as `pagerank`
    (static dangling decision, broadcast 1-row dangling mass, cadence
    checkpoints); update:

        rank' = (1−d)·pref + d·(Σ_in rank/deg + dang·pref)

    Unreachable non-seeds converge to exactly 0.0 (pref 0, no
    incoming), so the nonzero support is the seed-reachable set."""
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    if not seeds:
        raise ValueError("personalized_pagerank needs at least one seed")
    pref = F.when(
        F.col("node").isin(*[int(s) for s in seeds]), F.lit(1.0) / len(seeds)
    ).otherwise(F.lit(0.0))
    nodes_pref = nodes.select("node", pref.alias("pref")).localCheckpoint(eager=True)
    out_deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    has_dangling = not nodes.join(out_deg, "node", "left_anti").isEmpty()
    ranks = nodes_pref.select("node", F.col("pref").alias("rank"))
    one_minus_d = 1.0 - damping
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
            dang = with_deg.where(F.col("deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
            ranks = (
                nodes_pref.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    (
                        F.lit(one_minus_d) * F.col("pref")
                        + F.lit(damping) * (incoming + F.col("_dang") * F.col("pref"))
                    ).alias("rank"),
                )
            )
        else:
            ranks = nodes_pref.join(contribs, "node", "left").select(
                "node",
                (F.lit(one_minus_d) * F.col("pref") + F.lit(damping) * incoming).alias(
                    "rank"
                ),
            )
        if i % checkpoint_every == checkpoint_every - 1 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("ppr"))
