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
