"""Cached computed tables — the reference's incrementally-maintained
derived tables (Kernel/Drafts/draft:67-72 `index ... Cache(...)`).
`streaming/stateful.py` is the streaming analog; this is the batch
form: given a materialized aggregate and a delta of NEW base rows,
produce the refreshed aggregate WITHOUT rescanning the base table.

`refresh_mv` merges algebraically: COUNT/SUM/MIN/MAX are all
decomposable under insert-only deltas, so

    refreshed = mv ⟗ agg(delta)  (full outer on keys, merge columns)

touches only (a) the delta — typically a partition-pruned scan of new
data — and (b) the MV itself. Groups absent from the delta pass
through the join untouched; at scale, with the MV bucketed/partitioned
on the group keys, the merge join is co-located and the whole refresh
costs one shuffle of the (small) delta. Deletes/updates need
retraction counts (the streaming module's state shape) — out of scope
for the insert-only batch form, and documented as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table

# a merge spec is (output column, kind, input expression) with kind in
# {"count", "sum", "min", "max"} — the kind drives both the per-side
# aggregate and the merge expression


def _agg_exprs(specs: list[tuple[str, str, F.Column]]):
    out = []
    for name, kind, expr in specs:
        if kind == "count":
            out.append(F.count(F.lit(1)).alias(name))
        elif kind == "sum":
            out.append(F.sum(expr).alias(name))
        elif kind == "min":
            out.append(F.min(expr).alias(name))
        elif kind == "max":
            out.append(F.max(expr).alias(name))
        else:
            raise ValueError(f"unmergeable aggregate kind: {kind}")
    return out


def build_mv(base: DataFrame, keys: list[str], specs: list[tuple[str, str, F.Column]]) -> DataFrame:
    """Initial materialization: one hash aggregation over the base."""
    return base.groupBy(*keys).agg(*_agg_exprs(specs))


def refresh_mv(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, F.Column]],
) -> DataFrame:
    """Incremental refresh: aggregate the delta, merge into the MV.
    COUNT/SUM merge by +, MIN/MAX by least/greatest; insert-only."""
    d = delta.groupBy(*keys).agg(*_agg_exprs(specs))
    merge_cols = []
    for name, kind, _ in specs:
        old = F.col(f"mv.{name}")
        new = F.col(f"d.{name}")
        if kind == "count":
            merged = F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))
        elif kind == "sum":
            # SUM of all-NULL inputs is NULL, and a refresh must be
            # indistinguishable from a rebuild: only coalesce to 0
            # when at least one side carries a value
            merged = F.when(old.isNull() & new.isNull(), F.lit(None)).otherwise(
                F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))
            )
        elif kind == "min":
            merged = F.least(old, new)  # least/greatest skip NULLs
        else:  # max
            merged = F.greatest(old, new)
        merge_cols.append(merged.alias(name))
    # NULL-SAFE key equality: groupBy treats NULL as a real group, so
    # the merge join must too — a plain equi-join would leave the
    # NULL group's MV row and delta row un-merged (refresh != rebuild)
    mva, da = mv.alias("mv"), d.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"mv.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    return mva.join(da, cond, "full_outer").select(
        *[F.coalesce(F.col(f"mv.{k}"), F.col(f"d.{k}")).alias(k) for k in keys],
        *merge_cols,
    )


CUTOFF = "1997-01-01"


def _order_specs():
    revenue = F.col("o_totalprice").cast("decimal(18,4)")
    return [
        ("n_orders", "count", None),
        ("total_price", "sum", revenue),
        ("max_price", "max", F.col("o_totalprice")),
    ]


def incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: per-order-priority MV built from orders
    before CUTOFF, refreshed with the on-or-after-CUTOFF delta; the
    oracle recomputes the same aggregate from the FULL table — the
    refresh must be indistinguishable from a rebuild. Both scans are
    date-filtered (pushed to parquet), so the refresh path reads the
    delta partitions only; test_matview pins the pushed filters."""
    orders = load_table(spark, sf_dir, "orders")
    specs = _order_specs()
    keys = ["o_orderpriority"]
    mv = build_mv(orders.where(F.col("o_orderdate") < CUTOFF), keys, specs)
    # NULL order dates satisfy neither side of a <,>= split and would
    # vanish from the refresh while the oracle's full-table GROUP BY
    # counts them — route them into the delta branch explicitly
    delta = orders.where((F.col("o_orderdate") >= CUTOFF) | F.col("o_orderdate").isNull())
    refreshed = refresh_mv(mv, delta, keys, specs)
    return refreshed.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("total_price"), 2).cast("double").alias("total_price"),
        F.col("max_price").alias("max_price"),
    ).orderBy("o_orderpriority")


INCREMENTAL_MV_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------- CDC-driven refresh (r7)


def refresh_mv_from_changes(
    mv: DataFrame,
    changes: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, F.Column]],
    base: DataFrame | None = None,
) -> DataFrame:
    """Incremental MV refresh driven by a snapshot CHANGE FEED
    (sources/snapshot.read_changes rows: key/data columns + `_change`
    ∈ {insert, delete, update_pre, update_post}) — the lakehouse
    "incremental materialized view over CDF" pattern, and the general
    form of `refresh_mv` (which is insert-only):

    - COUNT/SUM maintain under RETRACTION: each change row carries a
      sign (+1 for insert/update_post, -1 for delete/update_pre), the
      signed delta aggregates per group (one shuffle ∝ changed rows),
      and merges into the MV by addition. An update's pre/post pair
      nets to the value difference; a group whose merged count reaches
      0 is dropped (all its rows were deleted).
    - MIN/MAX are NOT decomposable under retraction (deleting the
      current max reveals the runner-up, which the feed doesn't
      carry). Specs with min/max require `base` (the post-change
      table): the refresh recomputes them ONLY for groups present in
      the feed — a semi-join-pruned scan, ∝ touched groups'
      partitions when the base is partitioned/bucketed on the keys —
      and keeps the MV's stored values for untouched groups.

    Refresh must be indistinguishable from a rebuild over the
    post-change base (property-tested in tests/test_constraints_
    typed_mv.py, including count→0 group removal and deleted-max
    recomputes)."""
    has_minmax = any(kind in ("min", "max") for _, kind, _ in specs)
    if has_minmax and base is None:
        raise ValueError("min/max specs need `base` (not decomposable under deletes)")
    has_count = any(kind == "count" for _, kind, _ in specs)
    if not has_count and base is None:
        # without a row count the merge cannot tell a fully-retracted
        # group from a live one (sum-only/min-only specs would keep a
        # stale row for a group whose rows were all deleted, breaking
        # refresh-equals-rebuild) — demand the information needed
        raise ValueError(
            "specs without a 'count' spec need `base` to detect "
            "fully-retracted groups"
        )
    sign = F.when(F.col("_change").isin("insert", "update_post"), F.lit(1)).otherwise(
        F.lit(-1)
    )
    signed = changes.withColumn("_sign", sign)
    delta_aggs = []
    for name, kind, expr in specs:
        if kind == "count":
            delta_aggs.append(F.sum("_sign").alias(name))
        elif kind == "sum":
            delta_aggs.append(F.sum(F.col("_sign") * expr).alias(name))
        else:  # min/max recomputed from base for touched groups
            delta_aggs.append(F.lit(None).alias(name))
    d = signed.groupBy(*keys).agg(*delta_aggs)

    mva, da = mv.alias("mv"), d.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"mv.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    merge_cols = []
    count_col = None
    for name, kind, _ in specs:
        old, new = F.col(f"mv.{name}"), F.col(f"d.{name}")
        if kind == "count":
            merged = F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))
            count_col = name
        elif kind == "sum":
            merged = F.when(old.isNull() & new.isNull(), F.lit(None)).otherwise(
                F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))
            )
        else:
            merged = old  # placeholder; touched groups overridden below
        merge_cols.append(merged.alias(name))
    out = mva.join(da, cond, "full_outer").select(
        *[F.coalesce(F.col(f"mv.{k}"), F.col(f"d.{k}")).alias(k) for k in keys],
        *merge_cols,
    )
    if count_col is not None:
        # a retraction-closed group (count 0) leaves the view entirely
        out = out.where(F.col(count_col) != 0)
    elif base is not None:
        # no count spec: a feed-touched group with NO surviving base
        # row was fully retracted — remove it by membership instead of
        # arithmetic (the min/max fallback below would otherwise keep
        # its stale pre-delete values). Work ∝ changed groups: both
        # sides of `dead` are distinct key sets from the feed.
        # eqNullSafe throughout — a name-based anti join would
        # classify every NULL-keyed touched group as dead even while
        # base rows survive (NULL != NULL under join-name semantics).
        touched0 = changes.select(*keys).distinct().alias("t")
        based = base.select(*keys).distinct().alias("b")
        condd = None
        for k in keys:
            c = F.col(f"t.{k}").eqNullSafe(F.col(f"b.{k}"))
            condd = c if condd is None else (condd & c)
        dead = touched0.join(based, condd, "left_anti")
        outa0, deada = out.alias("o"), dead.alias("x")
        cond0 = None
        for k in keys:
            c = F.col(f"o.{k}").eqNullSafe(F.col(f"x.{k}"))
            cond0 = c if cond0 is None else (cond0 & c)
        out = outa0.join(deada, cond0, "left_anti")

    if has_minmax:
        touched = changes.select(*keys).distinct()
        mm_specs = [(n, k, e) for n, k, e in specs if k in ("min", "max")]
        # `_rec` marks groups the recompute COVERS — the override must
        # fire on membership, not on non-NULL values (a recomputed
        # all-NULL min is a real result, not a miss to fall back from)
        recomputed = (
            base.join(touched, keys, "left_semi")
            .groupBy(*keys)
            .agg(*_agg_exprs(mm_specs))
            .withColumn("_rec", F.lit(True))
        )
        ra = recomputed.alias("r")
        outa = out.alias("o")
        cond2 = None
        for k in keys:
            c = F.col(f"o.{k}").eqNullSafe(F.col(f"r.{k}"))
            cond2 = c if cond2 is None else (cond2 & c)
        # left join FROM `out`: a touched-but-fully-deleted group has
        # no surviving row and must stay gone
        sel = [F.col(f"o.{k}").alias(k) for k in keys]
        names_mm = {n for n, _, _ in mm_specs}
        for name, _, _ in specs:
            if name in names_mm:
                sel.append(
                    F.when(F.col("r._rec"), F.col(f"r.{name}"))
                    .otherwise(F.col(f"o.{name}"))
                    .alias(name)
                )
            else:
                sel.append(F.col(f"o.{name}").alias(name))
        out = outa.join(ra, cond2, "left").select(*sel)
    return out


def mv_cdc_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query (r7): incremental MV maintenance over a
    DURABLE table's change feed — build the per-priority aggregate MV
    at snapshot version 0, run a delete + an update + an insert batch
    (three OCC copy-on-write commits), then refresh the MV from
    `read_changes(0, current)` alone (COUNT/SUM via signed retraction
    arithmetic; MAX recomputed only for feed-touched groups against
    the post-change table). The oracle recomputes the FINAL state from
    scratch — refresh must be indistinguishable from a rebuild.

    Self-contained like heroql_durable_mutations: the snapshot lives
    in a fresh temp dir, seeded deterministically from `orders`."""
    import os
    import tempfile

    from herodb_spark.sources.snapshot import SnapshotTable

    orders = load_table(spark, sf_dir, "orders")
    base0 = orders.where(F.col("o_orderkey") % 7 < 5).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice").cast("decimal(18,4)"), 2)
        .cast("decimal(18,2)")
        .alias("price"),
    )
    tmp = tempfile.mkdtemp(prefix="mv_cdc_")
    snap = SnapshotTable.create(spark, os.path.join(tmp, "t"), base0, key_cols=["o_orderkey"])
    keys = ["o_orderpriority"]
    specs = [
        ("n_orders", "count", None),
        ("total_price", "sum", F.col("price")),
        ("max_price", "max", F.col("price")),
    ]
    mv0 = build_mv(snap.read(), keys, specs).localCheckpoint(eager=True)  # MV @ v0
    # v1: delete a slice of one priority (exercises retraction + the
    # deleted-max recompute); v2: update (pre/post pair in the feed);
    # v3: insert new keys incl. a brand-new group's worth of rows
    snap.delete_where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 3 == 0)
    )
    snap.update_where(
        F.col("price") > 300000,
        {"price": F.round(F.col("price") + 1000, 2).cast("decimal(18,2)")},
    )
    inserts = spark.range(1, 6).select(
        (F.lit(9_000_000) + F.col("id")).alias("o_orderkey"),
        F.lit("5-LOW").alias("o_orderpriority"),
        F.lit("123456.78").cast("decimal(18,2)").alias("price"),
    )
    snap.merge_upsert(inserts)
    changes = snap.read_changes(0)
    refreshed = refresh_mv_from_changes(mv0, changes, keys, specs, base=snap.read())
    return refreshed.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("total_price"), 2).cast("double").alias("total_price"),
        F.col("max_price").cast("double").alias("max_price"),
    ).orderBy("o_orderpriority")


MV_CDC_REFRESH_SQL = """
WITH base0 AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey % 7 < 5
),
afterdel AS (
  SELECT * FROM base0
  WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0)
),
afterupd AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN price > 300000
              THEN CAST(ROUND(price + 1000, 2) AS DECIMAL(18,2))
              ELSE price END AS price
  FROM afterdel
),
final AS (
  SELECT * FROM afterupd
  UNION ALL
  SELECT 9000000 + i, '5-LOW', CAST(123456.78 AS DECIMAL(18,2)) FROM range(1, 6) t(i)
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(price), 2) AS DOUBLE) AS total_price,
       CAST(MAX(price) AS DOUBLE) AS max_price
FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def matview_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered merge of incremental_mv_refresh (delta-batch MV
    maintenance) + mv_cdc_refresh (MV maintenance over a snapshot
    CHANGE FEED with signed retraction arithmetic — rotated into the
    graded window in round 8), tag-unioned on an op column; both
    constituents keep standalone registry entries + oracles."""
    a = incremental_mv_refresh(spark, sf_dir).select(
        F.lit("incremental").alias("op"), "*"
    )
    b = mv_cdc_refresh(spark, sf_dir).select(F.lit("cdc").alias("op"), "*")
    return a.unionByName(b).orderBy("op", "o_orderpriority")


MATVIEW_REFRESH_SQL = f"""
SELECT 'incremental' AS op, * FROM ({INCREMENTAL_MV_SQL})
UNION ALL
SELECT 'cdc', * FROM ({MV_CDC_REFRESH_SQL})
ORDER BY op, o_orderpriority
"""
