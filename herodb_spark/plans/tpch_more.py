"""The remaining TPC-H query patterns (q2, q8, q9, q11, q13..q17,
q19..q22), adapted to the driver's reduced synthetic schema the same
way q4/q12 were: no partsupp table (the supplier×part relation is
derived from lineitem), no commit/receipt dates (l_returnflag stands
in for "failed delivery"), no phone/container/shipmode columns
(nationkey / brand / size predicates replace them). Each function
keeps the ORIGINAL query's plan-shape challenge — correlated min
(q2), market share (q8), profit rollup (q9), scalar-threshold
subquery (q11), outer-join distribution (q13), conditional share
(q14), scalar-max view (q15), distinct-count with NOT-IN exclusion
(q16), correlated per-group average (q17), disjunctive predicates
(q19), nested semi-joins (q20), exists/not-exists over sibling sets
(q21), anti-join + scalar-avg subquery (q22).

Determinism contract (same as plans/tpch.py): money math in DECIMAL
(exact, order-independent partial sums), final values ROUNDed and
cast to DOUBLE, ties broken by explicit keys.

Scale notes: every query's big side is lineitem (or orders).
Broadcast hints are pinned ONLY on fixed-cardinality frames (nation,
region, 1-row scalar aggregates); part/supplier/customer scale
linearly with SF, so their join strategy is left to AQE — broadcast
at test SFs, graceful shuffle fallback at 100 TB. The
derived supplier×part aggregates shuffle once on their group key;
correlated subqueries are expressed as self-aggregate + join-back on
the same key, so Catalyst reuses the exchange where possible. No
collect()s, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(18,4)")


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern (adapted: supply cost = total lineitem sales
    value per supplier×part, since there is no partsupp): for SMALL
    parts of size <= 15, the EUROPE supplier(s) offering each part at
    the minimum total cost. The correlated MIN subquery becomes a
    window-min over the supplier×part aggregate — one shuffle on
    (partkey, suppkey), window on partkey reuses the same hashing."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    li = load_table(spark, sf_dir, "lineitem")

    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(part.select("p_partkey", "p_brand"), li.l_partkey == F.col("p_partkey"))
        .join(euro_supp, li.l_suppkey == euro_supp.s_suppkey)
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.sum(_dec("l_extendedprice")).alias("supply_cost"))
    )
    w = Window.partitionBy("p_partkey")
    out = (
        cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .where(F.col("supply_cost") == F.col("min_cost"))
        .select(
            F.round(F.col("s_acctbal").cast("decimal(18,4)"), 2).cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round(F.col("supply_cost"), 2).cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )
    return out


Q2_SQL = """
WITH cost AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS supply_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'SMALL' AND p_size <= 15 AND r_name = 'EUROPE'
  GROUP BY p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
)
SELECT CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,4)), 2) AS DOUBLE) AS s_acctbal,
       s_name, n_name, p_partkey, p_brand,
       CAST(ROUND(supply_cost, 2) AS DOUBLE) AS supply_cost
FROM cost c
WHERE supply_cost = (SELECT MIN(supply_cost) FROM cost c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's market share of ECONOMY-part revenue among
    ASIA-region customers, per order year. Share = conditional
    decimal sum / total decimal sum (exact), divided as double at the
    end. nation/region hint-broadcast, part/supplier/customer
    AQE-sized; one shuffle (lineitem⋈orders) + one agg."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    nation_s = load_table(spark, sf_dir, "nation").alias("ns")
    nation_c = load_table(spark, sf_dir, "nation").alias("nc")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    out = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == F.col("ns.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("ns.n_name") == "NATION_2", vol).otherwise(F.lit(0).cast("decimal(18,4)"))).alias("_nat"),
            F.sum(vol).alias("_tot"),
        )
        .select(
            "o_year",
            F.round(F.col("_nat").cast("double") / F.col("_tot").cast("double"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )
    return out


Q8_SQL = """
SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN ns.n_name = 'NATION_2'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region   ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern (adapted: supply cost = p_retailprice/2 per
    unit, since there is no ps_supplycost): profit by supplier nation
    and order year for PROMO parts. Profit stays DECIMAL end-to-end
    so partial-agg order can't skew the sum."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    profit = _dec("l_extendedprice") * (_one() - _dec("l_discount")) - (
        _dec("p_retailprice") * F.lit(0.5).cast("decimal(18,4)") * _dec("l_quantity")
    )
    out = (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )
    return out


Q9_SQL = """
SELECT n_name AS nation,
       CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(
         CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(0.5 AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))
       ), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY n_name, CAST(date_part('year', o_orderdate) AS INTEGER)
ORDER BY nation ASC, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern (adapted: stock value per part = lineitem
    sales value from NATION_3 suppliers): parts whose value exceeds
    0.0001 of the total. The scalar subquery is a 1-row aggregate
    broadcast-cross-joined into the filter — no driver round-trip,
    stays one lazy plan. Threshold compare is decimal-vs-decimal
    (exact), never double."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    li = load_table(spark, sf_dir, "lineitem")
    nat_li = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("l_partkey", _dec("l_extendedprice").alias("_v"))
    )
    per_part = nat_li.groupBy("l_partkey").agg(F.sum("_v").alias("part_value"))
    total = nat_li.agg(
        (F.sum("_v") * F.lit(0.0001).cast("decimal(8,4)")).alias("_threshold")
    )
    out = (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("_threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_value"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )
    return out


Q11_SQL = """
WITH nat_li AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS _v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS p_partkey,
       CAST(ROUND(SUM(_v), 2) AS DOUBLE) AS part_value
FROM nat_li
GROUP BY l_partkey
HAVING SUM(_v) > (SELECT SUM(_v) * CAST(0.0001 AS DECIMAL(8,4)) FROM nat_li)
ORDER BY part_value DESC, p_partkey ASC
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, keeping
    zero-order customers via LEFT OUTER join (orders restricted to
    non-URGENT). customer is the small side but must be the left/outer
    side, so the join shuffles on custkey; the two-level aggregation
    is two cheap exchanges on shrinking data."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    out = (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
    return out


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one ship
    month. Conditional decimal sums; single AQE-sized part join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    vol = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    out = (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,4)"))).alias("_promo"),
            F.sum(vol).alias("_tot"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo").cast("double") / F.col("_tot").cast("double"), 6).alias("promo_revenue")
        )
    )
    return out


Q14_SQL = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
           6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum 3-month revenue. The
    revenue "view" is one aggregate; the scalar MAX is a 1-row
    broadcast cross join; equality on exact decimals."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    vol = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(F.sum(vol).alias("total_revenue"))
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    out = (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
    return out


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern (adapted: supplier×part pairs from lineitem;
    the complaint-comment exclusion becomes s_acctbal < 0): distinct
    supplier counts per (brand, type, size) for a size set, excluding
    Brand#1 and PROMO. The NOT-IN supplier set is an SF-scaling
    filter of supplier, so the anti join is AQE-sized;
    distinct-count shuffles once on the group key."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.join(part.select("p_partkey", "p_brand", "p_type", "p_size"), li.l_partkey == F.col("p_partkey"))
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )
    return out


Q16_SQL = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    for Brand#2 MEDIUM parts weren't filled. The correlated per-part
    AVG becomes a per-part aggregate joined back on partkey; the
    "l_quantity < 0.5*avg" compare is cross-multiplied
    (2*n*qty < sum_qty) so it stays exact decimal, never double."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "MEDIUM")
    )
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = branded.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    )
    out = (
        branded.alias("b")
        .join(per_part.alias("p"), "l_partkey")
        .where(
            _dec("l_quantity") * F.lit(2).cast("decimal(18,4)") * F.col("_n").cast("decimal(18,4)")
            < F.col("_sum_qty")
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 4).alias("avg_yearly")
        )
    )
    return out


Q17_SQL = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2' AND p_type = 'MEDIUM'
),
per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS _sum_qty,
         COUNT(*) AS _n
  FROM branded GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM branded b JOIN per_part p ON b.l_partkey = p.l_partkey
WHERE CAST(b.l_quantity AS DECIMAL(18,4)) * CAST(2 AS DECIMAL(18,4)) * CAST(p._n AS DECIMAL(18,4)) < p._sum_qty
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three OR'd brand/size/quantity branches
    (adapted: container/shipmode predicates become size bands). The
    disjunction sits on the joined row; Catalyst still pushes the
    partkey equi-join and per-table IsNotNull/range residuals."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    vol = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    out = (
        li.join(part.select("p_partkey", "p_brand", "p_size"), li.l_partkey == F.col("p_partkey"))
        .where(cond)
        .agg(F.round(F.sum(vol), 2).cast("double").alias("revenue"))
    )
    return out


Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern (adapted: "supplied more than 50 units of
    some SMALL part during 1996" replaces the half-of-stock
    threshold): NATION_1 suppliers reached through two nested
    semi-joins (supplier ← qualifying supplier×part agg ← part set).
    The per-(supp,part) aggregate shuffles once; nation is
    hint-broadcast, supplier/part joins AQE-sized."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    qualifying = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .where(F.col("_qty") > 50)
        .select("l_suppkey")
    )
    out = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )
    return out


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 50
  )
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern (adapted: l_returnflag='R' marks the failed
    delivery instead of receipt>commit): suppliers who were the ONLY
    supplier with returned lines in a multi-supplier 'F' order. The
    EXISTS (another supplier in the order) and NOT EXISTS (another
    supplier with returns) become per-order distinct counts computed
    in ONE aggregation pass, then joined back — two shuffles total on
    orderkey, versus four for naive semi/anti joins."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    li_f = li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
    per_order = li_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("_n_ret"),
    )
    eligible = per_order.where((F.col("_n_supp") >= 2) & (F.col("_n_ret") == 1)).select("l_orderkey")
    out = (
        li_f.where(F.col("l_returnflag") == "R")
        .join(eligible, "l_orderkey", "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
    return out


Q21_SQL = """
WITH li_f AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS _n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS _n_ret
  FROM li_f GROUP BY l_orderkey
)
SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM li_f
  WHERE l_returnflag = 'R'
    AND l_orderkey IN (SELECT l_orderkey FROM per_order WHERE _n_supp >= 2 AND _n_ret = 1)
)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 pattern (adapted: the phone-prefix country set
    becomes a nationkey set): per-nation count and balance of
    customers with above-average positive balances and no orders.
    The scalar AVG is kept exact by cross-multiplying (bal*n > sum)
    instead of dividing — DuckDB's AVG(DECIMAL) returns DOUBLE while
    Spark's stays DECIMAL, and a boundary-row disagreement between the
    two would flip rows in/out of the result. "No recent orders"
    (since 2000 — the literal never-ordered set is empty at every
    test SF, which would make the gate vacuous) is an anti join left
    unhinted so AQE picks the side."""
    nations = [2, 5, 8, 11, 14, 17, 20]
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("2000-01-01"))
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("_sum_bal"),
        F.count(F.lit(1)).alias("_n_bal"),
    )
    out = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(_dec("c_acctbal") * F.col("_n_bal").cast("decimal(18,0)") > F.col("_sum_bal"))
        .join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
    return out


Q22_SQL = """
SELECT c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM customer
CROSS JOIN (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS _sum_bal, COUNT(*) AS _n_bal
  FROM customer
  WHERE c_acctbal > 0 AND c_nationkey IN (2, 5, 8, 11, 14, 17, 20)
) t
WHERE c_nationkey IN (2, 5, 8, 11, 14, 17, 20)
  AND CAST(c_acctbal AS DECIMAL(18,4)) * CAST(_n_bal AS DECIMAL(18,0)) > _sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


ALL_QUERIES = {
    "tpch_q2": (q2_min_cost_supplier, Q2_SQL),
    "tpch_q8": (q8_market_share, Q8_SQL),
    "tpch_q9": (q9_product_profit, Q9_SQL),
    "tpch_q11": (q11_important_stock, Q11_SQL),
    "tpch_q13": (q13_customer_distribution, Q13_SQL),
    "tpch_q14": (q14_promo_revenue, Q14_SQL),
    "tpch_q15": (q15_top_supplier, Q15_SQL),
    "tpch_q16": (q16_parts_supplier_counts, Q16_SQL),
    "tpch_q17": (q17_small_quantity_revenue, Q17_SQL),
    "tpch_q19": (q19_disjunctive_revenue, Q19_SQL),
    "tpch_q20": (q20_excess_suppliers, Q20_SQL),
    "tpch_q21": (q21_waiting_suppliers, Q21_SQL),
    "tpch_q22": (q22_global_sales_opportunity, Q22_SQL),
}


def q13_q16_q22_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered tag-union of TPC-H q13 + q16 + q22 (the q4_q6_q12
    contract): LEFT-OUTER distribution, distinct-supplier counts with
    NOT-IN exclusion, and the anti-join + scalar-avg pattern share one
    graded slot; each constituent keeps its standalone function,
    oracle, and both-SF unit hash checks."""
    ns = F.lit(None).cast("string")
    nb = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    a = q13_customer_distribution(spark, sf_dir).select(
        F.lit("q13").alias("q"), ns.alias("k1"), ns.alias("k2"),
        F.col("c_count").cast("long").alias("n1"),
        F.col("custdist").cast("long").alias("n2"),
        nd.alias("v"),
    )
    b = q16_parts_supplier_counts(spark, sf_dir).select(
        F.lit("q16").alias("q"),
        F.col("p_brand").alias("k1"),
        F.col("p_type").alias("k2"),
        F.col("p_size").cast("long").alias("n1"),
        F.col("supplier_cnt").cast("long").alias("n2"),
        nd.alias("v"),
    )
    c = q22_global_sales_opportunity(spark, sf_dir).select(
        F.lit("q22").alias("q"), ns.alias("k1"), ns.alias("k2"),
        F.col("cntrycode").cast("long").alias("n1"),
        F.col("numcust").cast("long").alias("n2"),
        F.col("totacctbal").alias("v"),
    )
    return a.unionByName(b).unionByName(c).orderBy("q", "k1", "k2", "n1", "n2")


Q13_Q16_Q22_SQL = f"""
SELECT 'q13' AS q, CAST(NULL AS VARCHAR) AS k1, CAST(NULL AS VARCHAR) AS k2,
       CAST(c_count AS BIGINT) AS n1, CAST(custdist AS BIGINT) AS n2, CAST(NULL AS DOUBLE) AS v
FROM ({Q13_SQL})
UNION ALL
SELECT 'q16', p_brand, p_type, CAST(p_size AS BIGINT), CAST(supplier_cnt AS BIGINT), CAST(NULL AS DOUBLE)
FROM ({Q16_SQL})
UNION ALL
SELECT 'q22', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(cntrycode AS BIGINT), CAST(numcust AS BIGINT), totacctbal
FROM ({Q22_SQL})
ORDER BY q, k1, k2, n1, n2
"""


def q14_q15_q19_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered tag-union of TPC-H q14 + q15 + q19: promo revenue
    share, the scalar-max revenue view, and the disjunctive-predicate
    revenue — three scalar/near-scalar revenue patterns in one graded
    slot; constituents keep their standalone oracles."""
    ns = F.lit(None).cast("string")
    nb = F.lit(None).cast("long")
    a = q14_promo_revenue(spark, sf_dir).select(
        F.lit("q14").alias("q"), ns.alias("k1"), nb.alias("n1"),
        F.col("promo_revenue").alias("v"),
    )
    b = q15_top_supplier(spark, sf_dir).select(
        F.lit("q15").alias("q"),
        F.col("s_name").alias("k1"),
        F.col("s_suppkey").cast("long").alias("n1"),
        F.col("total_revenue").alias("v"),
    )
    c = q19_disjunctive_revenue(spark, sf_dir).select(
        F.lit("q19").alias("q"), ns.alias("k1"), nb.alias("n1"),
        F.col("revenue").alias("v"),
    )
    return a.unionByName(b).unionByName(c).orderBy("q", "k1", "n1")


Q14_Q15_Q19_SQL = f"""
SELECT 'q14' AS q, CAST(NULL AS VARCHAR) AS k1, CAST(NULL AS BIGINT) AS n1, promo_revenue AS v
FROM ({Q14_SQL})
UNION ALL
SELECT 'q15', s_name, CAST(s_suppkey AS BIGINT), total_revenue
FROM ({Q15_SQL})
UNION ALL
SELECT 'q19', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), revenue
FROM ({Q19_SQL})
ORDER BY q, k1, n1
"""


def q2_q11_q17_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered tag-union of TPC-H q2 + q11 + q17 (round-5 window
    widening): correlated window-MIN supplier selection, the
    scalar-threshold stock subquery, and the correlated per-part AVG —
    with these graded, EVERY query of the 22-suite holds an official
    driver row. Constituents keep standalone functions/oracles."""
    ns = F.lit(None).cast("string")
    nb = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    a = q2_min_cost_supplier(spark, sf_dir).select(
        F.lit("q2").alias("q"),
        F.col("s_name").alias("k1"),
        F.col("n_name").alias("k2"),
        F.col("p_brand").alias("k3"),
        F.col("p_partkey").cast("long").alias("n1"),
        F.col("s_acctbal").cast("double").alias("v1"),
        F.col("supply_cost").cast("double").alias("v2"),
    )
    b = q11_important_stock(spark, sf_dir).select(
        F.lit("q11").alias("q"), ns.alias("k1"), ns.alias("k2"), ns.alias("k3"),
        F.col("p_partkey").cast("long").alias("n1"),
        F.col("part_value").cast("double").alias("v1"),
        nd.alias("v2"),
    )
    c = q17_small_quantity_revenue(spark, sf_dir).select(
        F.lit("q17").alias("q"), ns.alias("k1"), ns.alias("k2"), ns.alias("k3"),
        nb.alias("n1"),
        F.col("avg_yearly").cast("double").alias("v1"),
        nd.alias("v2"),
    )
    return a.unionByName(b).unionByName(c).orderBy("q", "n1", "k1", "k2", "k3")


Q2_Q11_Q17_SQL = f"""
SELECT 'q2' AS q, s_name AS k1, n_name AS k2, p_brand AS k3,
       CAST(p_partkey AS BIGINT) AS n1, s_acctbal AS v1, supply_cost AS v2
FROM ({Q2_SQL})
UNION ALL
SELECT 'q11', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(p_partkey AS BIGINT), part_value, CAST(NULL AS DOUBLE)
FROM ({Q11_SQL})
UNION ALL
SELECT 'q17', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), avg_yearly, CAST(NULL AS DOUBLE)
FROM ({Q17_SQL})
ORDER BY q, n1, k1, k2, k3
"""


def q8_q9_q20_q21_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered tag-union of TPC-H q8 + q9 + q20 + q21: market
    share, profit rollup, the nested semi-join supplier chain, and the
    exists/not-exists waiting-supplier count."""
    ns = F.lit(None).cast("string")
    nb = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    a = q8_market_share(spark, sf_dir).select(
        F.lit("q8").alias("q"), ns.alias("k1"), ns.alias("k2"),
        F.col("o_year").cast("long").alias("n1"),
        F.col("mkt_share").cast("double").alias("v"),
    )
    b = q9_product_profit(spark, sf_dir).select(
        F.lit("q9").alias("q"),
        F.col("nation").alias("k1"),
        ns.alias("k2"),
        F.col("o_year").cast("long").alias("n1"),
        F.col("sum_profit").cast("double").alias("v"),
    )
    c = q20_excess_suppliers(spark, sf_dir).select(
        F.lit("q20").alias("q"),
        F.col("s_name").alias("k1"),
        ns.alias("k2"),
        F.col("s_suppkey").cast("long").alias("n1"),
        nd.alias("v"),
    )
    d = q21_waiting_suppliers(spark, sf_dir).select(
        F.lit("q21").alias("q"),
        F.col("s_name").alias("k1"),
        F.col("n_name").alias("k2"),
        F.col("numwait").cast("long").alias("n1"),
        nd.alias("v"),
    )
    return a.unionByName(b).unionByName(c).unionByName(d).orderBy("q", "k1", "k2", "n1")


Q8_Q9_Q20_Q21_SQL = f"""
SELECT 'q8' AS q, CAST(NULL AS VARCHAR) AS k1, CAST(NULL AS VARCHAR) AS k2,
       CAST(o_year AS BIGINT) AS n1, mkt_share AS v
FROM ({Q8_SQL})
UNION ALL
SELECT 'q9', nation, CAST(NULL AS VARCHAR), CAST(o_year AS BIGINT), sum_profit
FROM ({Q9_SQL})
UNION ALL
SELECT 'q20', s_name, CAST(NULL AS VARCHAR), CAST(s_suppkey AS BIGINT), CAST(NULL AS DOUBLE)
FROM ({Q20_SQL})
UNION ALL
SELECT 'q21', s_name, n_name, CAST(numwait AS BIGINT), CAST(NULL AS DOUBLE)
FROM ({Q21_SQL})
ORDER BY q, k1, k2, n1
"""
