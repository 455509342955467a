"""Graded queries driven through the HeroQL front-end.

These operators don't hand-build DataFrames: each one feeds a HeroQL
PROGRAM — the reference's own query language (Kernel/Drafts/draft,
draft_students) — through herodb_spark.heroql and returns the
compiled DataFrame. The oracle SQL describes the same semantics
directly, so the driver gate checks the WHOLE front-end (lexer →
parser → compiler → Catalyst plan) for value-identical results.

Scale: the compiler emits ordinary declarative plans — the rule
bodies below become the same join/anti-join/window/aggregate plans a
hand-written operator would produce, with pushdown and broadcast
decided by Catalyst. See herodb_spark/heroql/compiler.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from herodb_spark.catalog import load_table
from herodb_spark.heroql import HeroQL, HeroQLError


def _session(spark: SparkSession, sf_dir: str, tables: list[str]) -> HeroQL:
    hql = HeroQL(spark)
    for name in tables:
        df = load_table(spark, sf_dir, name)
        hql.register(name, df)
    return hql


def heroql_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog rule surface end-to-end (draft:55-66, 102-117): a
    `data class` row variable with field deref, union of two rule
    cases, a `not` anti-join, and a final three-way rule query —
    written in HeroQL, compiled to one Catalyst plan."""
    hql = HeroQL(spark)
    hql.register("Cust", load_table(spark, sf_dir, "customer"), is_class=True, key="c_custkey")
    hql.register("orders", load_table(spark, sf_dir, "orders"))
    hql.register("nation", load_table(spark, sf_dir, "nation"))
    res = hql.run("""
        data Flagged(cust : int, why : string);
        Flagged(c, "no_urgent") :- Cust(c), not orders(_, c, _, _, _, "1-URGENT");
        Flagged(c, "negative")  :- Cust(c), c.c_acctbal < 0.0;

        query (cust, nname, why) :-
            Flagged(cust, why), Cust(cust), nation(cust.c_nationkey, nname, _);
    """)
    return res.queries[0]


HEROQL_RULES_SQL = """
SELECT DISTINCT f.cust, n_name AS nname, f.why
FROM (
  SELECT c_custkey AS cust, 'no_urgent' AS why FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
  UNION
  SELECT c_custkey AS cust, 'negative' AS why FROM customer WHERE c_acctbal < 0.0
) f
JOIN customer ON c_custkey = f.cust
JOIN nation ON n_nationkey = c_nationkey
"""


def heroql_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The draft's aggregation pipeline verbatim (draft:146-162,
    draft_students:36-53): collection_query → partition_by with
    OrderByDesc top-k → group_by with Count/Average and a `:- having`
    → order_by_desc → range_by. Average stays exact: l_quantity is
    integer-valued, so double sums are associativity-free.

    Determinism contract (pinned in the compiler): partition_by
    breaks order ties with the header columns in header order, and
    range_by's row_number orders by the last order_by expression then
    every current column."""
    hql = _session(spark, sf_dir, ["lineitem"])
    res = hql.run("""
        collection_query(suppkey, orderkey, linenumber, quantity) :-
            lineitem(orderkey, _, suppkey, linenumber, quantity, _, _, _, _, _, _)
        partition_by suppkey(suppkey, orderkey, linenumber, sample = OrderByDesc(quantity, 3))
        group_by suppkey(suppkey, n_top = Count(sample), avg_top = Average(sample))
            :- avg_top >= 30.0
        order_by_desc avg_top
        range_by 1..20;
    """)
    return res.queries[0]


HEROQL_PIPELINE_SQL = """
WITH topk AS (
  SELECT l_suppkey AS suppkey, l_quantity AS sample,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_quantity DESC, l_suppkey, l_orderkey, l_linenumber, l_quantity
         ) AS rn
  FROM lineitem
),
grouped AS (
  SELECT suppkey, COUNT(sample) AS n_top, AVG(sample) AS avg_top
  FROM topk WHERE rn <= 3 GROUP BY suppkey
  HAVING AVG(sample) >= 30.0
)
SELECT suppkey, n_top, avg_top FROM (
  SELECT suppkey, n_top, avg_top,
         ROW_NUMBER() OVER (ORDER BY avg_top DESC, suppkey, n_top, avg_top) AS rn2
  FROM grouped
) WHERE rn2 BETWEEN 1 AND 20
"""


def heroql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The draft's recursive Fib VERBATIM (draft:81-84) through the
    inflationary-fixpoint rule evaluator, plus the bounded projection
    query. sf_dir is unused — the program is self-contained."""
    hql = HeroQL(spark, max_iters=16)
    res = hql.run("""
        func Fib(in i, out o);
        case Fib(1, 1);
        case Fib(2, 1);
        case Fib(a, b) :- Fib(a-1, x), Fib(a-2, y), b = x + y;

        query (i, o) :- Fib(i, o), i <= 15;
    """)
    return res.queries[0]


HEROQL_RECURSIVE_SQL = """
WITH RECURSIVE f(i, a, b) AS (
  SELECT 1, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT i + 1, b, a + b FROM f WHERE i < 15
)
SELECT i, a AS o FROM f
"""


def heroql_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutation statements (draft:128-136): set inserts, a
    simultaneous-from-old-values update, a predicate remove, then a
    query over the final state. Self-contained and deterministic;
    sf_dir unused."""
    hql = HeroQL(spark)
    res = hql.run("""
        data Ledger(k : int, v : int);
        set Ledger(1, 10);
        set Ledger(2, 20);
        set Ledger(3, 30);
        set Ledger(4, 0);
        update Ledger(k, v) :- k <= 2, v = v * 10;
        remove Ledger(_, v) :- v == 0;

        query (k, v) :- Ledger(k, v);
    """)
    return res.queries[0]


HEROQL_MUTATIONS_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(100 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(200 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(30  AS BIGINT))
) t(k, v)
"""


def heroql_durable_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME mutation statements, DURABLE (draft:128-136 wired to
    the snapshot layer — round-5 verdict "missing #3"): Ledger is a
    sources/snapshot.SnapshotTable, so each statement commits one OCC
    copy-on-write version — `set` → MERGE, `update :-` →
    update_where, `remove :-` → delete_where — leaving a
    time-travelable history (create → merge_upsert → update_where →
    delete_where, pinned in tests/test_heroql.py). Values must
    hash-match the in-memory heroql_mutations oracle exactly.
    Self-contained (sf_dir unused); the table lives in a fresh temp
    directory per run."""
    import os
    import tempfile

    from herodb_spark.sources.snapshot import SnapshotTable

    import shutil

    tmp = tempfile.mkdtemp(prefix="heroql_snap_")
    try:
        seed = spark.createDataFrame([], "k long, v long")
        snap = SnapshotTable.create(spark, os.path.join(tmp, "ledger"), seed, key_cols=["k"])
        hql = HeroQL(spark)
        hql.register_snapshot("Ledger", snap)
        res = hql.run("""
            set Ledger(1, 10);
            set Ledger(2, 20);
            set Ledger(3, 30);
            set Ledger(4, 0);
            update Ledger(k, v) :- k <= 2, v = v * 10;
            remove Ledger(_, v) :- v == 0;

            query (k, v) :- Ledger(k, v);
        """)
        # materialize (report-sized) so the staging table can be freed
        return res.queries[0].localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_INSTALL_DDL = """
    data class Prog(pid : int, pname : string, declarations * owner : Decl, n..n) index Unique(pid);
    data class Decl(did : int, dname : string) index Unique(did);
    data class Scope(sid : int, parent : int) index AutoIncresed(sid), Unique(sid);
    data AstScopes(scope : int, node : int) index Unique(scope, node);
    data Symbols(scope : int, sname : string, stype : string, createdBy : int)
        index Unique(scope, sname);
    data Errors(message : string);
"""

_INSTALL_PROGRAM = """
for query(p) :- Prog(p)
(
    let scope = Scope{ parent = 0 },
    ensure set AstScopes(scope, p),
    if not set Symbols(scope, "int", "Int", p) then set Errors($"int clash in $(p)"),
    for p.declarations(decl)
    (
        if not set Symbols(scope, decl.dname, $"Fn($(decl.dname))", decl)
            then set Errors($"Duplicated function $(decl.dname) found.")
    )
);
"""


def heroql_typeactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The draft_type ACTION dialect end-to-end (draft_type:183-341,
    the trimmed Install_1 of draft_type:193-207/318-326): per-program
    `let Scope{...}` fresh-id constructors over an AutoIncresed index,
    `ensure set`, first-wins `if not set … then` installs with
    $-interpolated diagnostics, and nested member `for` — run as one
    HeroQL program over a literal fixture (self-contained; sf_dir
    unused), with all four produced tables tag-unioned into
    (tbl, k2, k3, n1, n2) so the whole dialect earns a driver-graded
    hash row. GRADED via the heroql_programs tag-union since round 10;
    this standalone entry + oracle kept. Cites the same reference
    surface as tests/test_heroql.py's pinned-semantics tests."""
    hql = HeroQL(spark)
    hql.run(_INSTALL_DDL)
    hql.register(
        "Prog",
        spark.createDataFrame([(1, "main"), (2, "aux")], "pid long, pname string"),
        is_class=True,
        key="pid",
    )
    hql.register(
        "Decl",
        spark.createDataFrame(
            [(10, "f"), (11, "g"), (12, "f"), (20, "h"), (21, "h")],
            "did long, dname string",
        ),
        is_class=True,
        key="did",
    )
    hql.register(
        "Prog__declarations",
        spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)], "src long, dst long"
        ),
    )
    hql.run(_INSTALL_PROGRAM)
    ns = F.lit(None).cast("string")
    nb = F.lit(None).cast("long")
    sc = hql.table("Scope").select(
        F.lit("Scope").alias("tbl"),
        ns.alias("k2"),
        ns.alias("k3"),
        F.col("sid").cast("long").alias("n1"),
        F.col("parent").cast("long").alias("n2"),
    )
    an = hql.table("AstScopes").select(
        F.lit("AstScopes").alias("tbl"),
        ns.alias("k2"),
        ns.alias("k3"),
        F.col("scope").cast("long").alias("n1"),
        F.col("node").cast("long").alias("n2"),
    )
    sy = hql.table("Symbols").select(
        F.lit("Symbols").alias("tbl"),
        F.col("sname").alias("k2"),
        F.col("stype").alias("k3"),
        F.col("scope").cast("long").alias("n1"),
        F.col("createdBy").cast("long").alias("n2"),
    )
    er = hql.table("Errors").select(
        F.lit("Errors").alias("tbl"),
        F.col("message").alias("k2"),
        ns.alias("k3"),
        nb.alias("n1"),
        nb.alias("n2"),
    )
    return (
        sc.unionByName(an).unionByName(sy).unionByName(er)
        .orderBy("tbl", "k2", "k3", "n1", "n2")
    )


# the same relations the language produces, derived relationally from
# the literal fixture: scope ids are dense in pid order (AutoIncresed
# over the driving query), installs are first-wins per (scope, name)
# with losers becoming diagnostics
_TYPEACTIONS_CORE_SQL = """
WITH prog(pid) AS (VALUES (1),(2)),
decl(did, dname) AS (VALUES (10,'f'),(11,'g'),(12,'f'),(20,'h'),(21,'h')),
edges(src, dst) AS (VALUES (1,10),(1,11),(1,12),(2,20),(2,21)),
scopes AS (SELECT pid, ROW_NUMBER() OVER (ORDER BY pid) AS sid FROM prog),
cand AS (
  SELECT s.sid AS scope, d.dname AS sname, 'Fn(' || d.dname || ')' AS stype,
         d.did AS createdBy,
         ROW_NUMBER() OVER (PARTITION BY s.sid, d.dname ORDER BY e.src, s.sid, e.dst) AS rk
  FROM edges e JOIN scopes s ON e.src = s.pid JOIN decl d ON e.dst = d.did
)
SELECT 'Scope' AS tbl, CAST(NULL AS VARCHAR) AS k2, CAST(NULL AS VARCHAR) AS k3,
       CAST(sid AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2
FROM scopes
UNION ALL
SELECT 'AstScopes', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(sid AS BIGINT), CAST(pid AS BIGINT)
FROM scopes
UNION ALL
SELECT 'Symbols', 'int', 'Int', CAST(sid AS BIGINT), CAST(pid AS BIGINT)
FROM scopes
UNION ALL
SELECT 'Symbols', sname, stype, CAST(scope AS BIGINT), CAST(createdBy AS BIGINT)
FROM cand WHERE rk = 1
UNION ALL
SELECT 'Errors', 'Duplicated function ' || sname || ' found.',
       CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM cand WHERE rk > 1
"""

HEROQL_TYPEACTIONS_SQL = f"""
SELECT * FROM ({_TYPEACTIONS_CORE_SQL}) ORDER BY tbl, k2, k3, n1, n2
"""


def heroql_maintenance_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage maintenance + the program log IN the language
    (compiler maintenance routing + Rewrite.md:6 "save query to log"),
    as one oracle-checked relation. Self-contained (sf_dir unused);
    deterministic schedule on a fresh grp-partitioned snapshot table
    seeded with k∈[0,8), x=2k, g=k%2:

    - `set T(100, 1, 0); set T(101, 2, 1);` — one batched durable
      merge (v1) whose version entry persists BOTH statement texts;
    - `update T(k, x, g) :- k == 100, x = x + 7;` — a predicate
      mutation (v2), its program text persisted too;
    - `optimize T cluster_by (x);` — z-order rewrite (v3), content
      bit-identical, no program (maintenance, not mutation);
    - `vacuum T keep 3;` — retention GC drops v0; current content and
      the surviving log are unaffected.

    Output legs (leg, k2, k3, n1, n2):
    - 'content'  — the final table THROUGH the clustered files and
                   after the vacuum (k in n1, x in n2, g in k2);
    - 'pushdown' — `query ... :- T(k, x, _), k >= 100` — the
                   language→zone-map pushdown read path
                   (compiler's _skippable pruning): must equal the
                   plain predicate or pruning lost rows;
    - 'hist'     — `history(T, ver, op, prog)` after the vacuum: the
                   surviving (version, op, PROGRAM TEXT) audit log.

    GRADED via the heroql_programs tag-union since round 10 (maint
    branch); this standalone entry + oracle kept. Grades the
    heroql_maintenance, heroql_program_log, and heroql_zone_map_
    pushdown SURVEY rows."""
    import os
    import shutil
    import tempfile

    from herodb_spark.sources.snapshot import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="heroql_mnt_")
    try:
        seed = spark.range(8).selectExpr(
            "id AS k", "id * 2 AS x", "CAST(id % 2 AS LONG) AS g"
        )
        snap = SnapshotTable.create(
            spark, os.path.join(tmp, "t"), seed, key_cols=["k"], partition_col="g"
        )
        hql = HeroQL(spark)
        hql.register_snapshot("T", snap)
        hql.run("set T(100, 1, 0); set T(101, 2, 1);")
        hql.run("update T(k, x, g) :- k == 100, x = x + 7;")
        hql.run("optimize T cluster_by (x);")
        hql.run("vacuum T keep 3;")
        ns = F.lit(None).cast("string")
        nb = F.lit(None).cast("long")
        content = hql.run("query (k, x, g) :- T(k, x, g);").queries[0].select(
            F.lit("content").alias("leg"),
            F.col("g").cast("string").alias("k2"),
            ns.alias("k3"),
            F.col("k").cast("long").alias("n1"),
            F.col("x").cast("long").alias("n2"),
        )
        pushdown = hql.run(
            "query (k, x) :- T(k, x, _), k >= 100;"
        ).queries[0].select(
            F.lit("pushdown").alias("leg"),
            ns.alias("k2"),
            ns.alias("k3"),
            F.col("k").cast("long").alias("n1"),
            F.col("x").cast("long").alias("n2"),
        )
        hist = hql.run(
            "query (ver, op, prog) :- history(T, ver, op, prog);"
        ).queries[0].select(
            F.lit("hist").alias("leg"),
            F.col("op").alias("k2"),
            F.col("prog").alias("k3"),
            F.col("ver").cast("long").alias("n1"),
            nb.alias("n2"),
        )
        # materialize (report-sized) so the staging table can be freed
        return (
            content.unionByName(pushdown).unionByName(hist)
            .orderBy("leg", "n1", "k2")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_MAINT_CORE_SQL = """
WITH seed(k, x, g) AS (
  SELECT i, i * 2, i % 2 FROM generate_series(0, 7) t(i)
),
final(k, x, g) AS (
  SELECT k, x, g FROM seed
  UNION ALL
  SELECT * FROM (VALUES (100, 8, 0), (101, 2, 1))
)
SELECT 'content' AS leg, CAST(g AS VARCHAR) AS k2, CAST(NULL AS VARCHAR) AS k3,
       CAST(k AS BIGINT) AS n1, CAST(x AS BIGINT) AS n2
FROM final
UNION ALL
SELECT 'pushdown', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(k AS BIGINT), CAST(x AS BIGINT)
FROM final WHERE k >= 100
UNION ALL
SELECT 'hist', op, prog, CAST(v AS BIGINT), CAST(NULL AS BIGINT)
FROM (VALUES
  (1, 'merge_upsert', 'set T(100, 1, 0);' || chr(10) || 'set T(101, 2, 1);'),
  (2, 'update_where', 'update T(k, x, g) :- k == 100, x = x + 7;'),
  (3, 'cluster', CAST(NULL AS VARCHAR))
) h(v, op, prog)
"""

HEROQL_MAINTENANCE_LOG_SQL = f"""
SELECT * FROM ({_MAINT_CORE_SQL}) ORDER BY leg, n1, k2
"""


def heroql_cached_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CACHED-QUERY protocol run as a graded program
    (Kernel/README.md "Cached Query"): a standalone
    `index Sib { Hash(a) }` declaration on a rule-defined relation,
    then the SAME constant-bound query submitted twice. The first
    submission computes and pins the per-value subset (miss), the
    second is served from the cache (hit) — both result sets AND the
    deterministic hit/miss counters are in the hash, so a cache that
    returned stale/partial rows, or a protocol that recomputed instead
    of caching, goes red. Cover resolution / recursion-stop /
    invalidation are library-tested (tests/test_heroql.py,
    tests/test_namespace_mutation.py on namespace.QueryCache)."""
    hql = HeroQL(spark)
    nat = load_table(spark, sf_dir, "nation")
    hql.register("nat", nat)
    # the probed key is DATA-DERIVED (nation key 1's name), not a
    # literal tied to one testdata generation — the cache path needs a
    # constant in the atom, so resolve it driver-side (1 row) and
    # interpolate; the oracle derives the same name in SQL
    probe = nat.where(F.col("n_nationkey") == 1).first().n_name
    hql.run("""
        data Sib(a: string, b: string);
        case Sib(a, b) :- nat(_, a, r), nat(_, b, r), a != b;
        index Sib { Hash(a) };
    """)
    q1 = hql.run(f'query (b) :- Sib("{probe}", b);').queries[0]
    q2 = hql.run(f'query (b) :- Sib("{probe}", b);').queries[0]
    nb = F.lit(None).cast("long")
    stats = hql._qcache_stats
    rows = [("stats", None, int(stats["hits"]), int(stats["misses"]))]
    lit = spark.createDataFrame(rows, "phase string, k string, n1 long, n2 long")
    out = (
        q1.select(F.lit("q1").alias("phase"), F.col("b").alias("k"), nb.alias("n1"), nb.alias("n2"))
        .unionByName(
            q2.select(F.lit("q2").alias("phase"), F.col("b").alias("k"), nb.alias("n1"), nb.alias("n2"))
        )
        .unionByName(lit)
    )
    return out.orderBy("phase", "k")


HEROQL_CACHED_QUERY_SQL = """
WITH sib AS (
  SELECT n2.n_name AS b
  FROM nation n1 JOIN nation n2
    ON n1.n_regionkey = n2.n_regionkey AND n1.n_name <> n2.n_name
  WHERE n1.n_name = (SELECT n_name FROM nation WHERE n_nationkey = 1)
)
SELECT 'q1' AS phase, b AS k, CAST(NULL AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2 FROM sib
UNION ALL
SELECT 'q2', b, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM sib
UNION ALL
SELECT 'stats', CAST(NULL AS VARCHAR), 1, 1
ORDER BY phase, k
"""


def heroql_outquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-argument query functions run as a graded program
    (Kernel/README.md "Output only argument"): `query Square(x) ->
    (x2)` and a NESTED caller `Quartic` (whose body invokes Square and
    carries a `s > 4` GUARD — a failing guard yields no row, the
    relational reading), both invoked per nation row with `<-`
    bindings. Compiles to pure Catalyst column expressions inlined
    into the one scan — no UDF, no extra plan node. Direction checks
    (cannot run backward) and the Solve two-output README example are
    library-tested (tests/test_heroql.py)."""
    hql = HeroQL(spark)
    hql.register("nat", load_table(spark, sf_dir, "nation"))
    res = hql.run("""
        query Square(x: int) -> (x2: int)
        :- x2 <- x * x;
        query Quartic(x: int) -> (x4: int)
        :- s <- Square(x), s > 4, x4 <- s * s;
        query (k, s, q) :- nat(k, _, _), s <- Square(k), q <- Quartic(k);
    """)
    return res.queries[0].select(
        F.col("k").cast("long").alias("k"),
        F.col("s").cast("long").alias("s"),
        F.col("q").cast("long").alias("q"),
    ).orderBy("k")


HEROQL_OUTQUERY_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS k,
       CAST(n_nationkey * n_nationkey AS BIGINT) AS s,
       CAST(n_nationkey * n_nationkey * n_nationkey * n_nationkey AS BIGINT) AS q
FROM nation
WHERE n_nationkey * n_nationkey > 4
ORDER BY k
"""


def heroql_at_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kernel/README.md `@`-command query dialect, its four
    worked examples VERBATIM (README "order_by, order_by_desc" →
    "REMOVE" sections): Top10 (global 0-based rank + `order < 10`),
    Top3ScorePerStudent (`@partition` scoping the rank),
    AverageTop3ScorePerStudent (`@aggregate(average(score))` rebinding
    `score`, with its out-of-order `index { Unique(student) }`
    declaration — "the order is not important"), and the
    AddExam/UpdateExam/RemoveExam mutation procedures invoked as
    `Name(args);` statements. Exams derives from `orders` (students =
    custkeys ≡ 0 mod 50, score = floor(totalprice·100)), so the data
    scales with SF while the programs stay the README's own text.

    Scale: Top10 is one window over the scan; the per-student legs are
    the standard partitioned-window + partial-agg shuffle on the
    partition key; the procedures compile to the same set/update_where/
    delete_where plans the draft mutation statements use. Output
    tag-union (part, student, n1, n2) with part ∈ {top10, top3, avg3,
    mut}."""
    orders = load_table(spark, sf_dir, "orders")
    exams = orders.where(F.col("o_custkey") % 50 == 0).select(
        F.col("o_custkey").cast("string").alias("student"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("score"),
    )
    hql = HeroQL(spark)
    hql.register("Exams", exams)
    res = hql.run("""
query Top10() -> (student: string, score: int)
:-	Exams(student, score),
	order <- @order_by_desc(score),
	order < 10
.

query Top3ScorePerStudent(student: string) -> (score: int, order: int)
:-	Exams(student, score),
	@partition(student),
	order <- @order_by_desc(score),
	order < 3
.

index AverageTop3ScorePerStudent {
	Unique(student);
}

query AverageTop3ScorePerStudent(student: string) -> (average: int)
:-	Exams(student, score),
	@partition(student),
	order <- @order_by_desc(score),
	order < 3,
	@aggregate(average(score)),
	average <- score
.

query (student, score) :- Top10(student, score);
query (student, score, order) :- Top3ScorePerStudent(student, score, order);
query (student, average) :- AverageTop3ScorePerStudent(student, average);
""")
    # mutation procedures on a fresh session over the same Exams
    # (verbatim AddExam/UpdateExam/RemoveExam, probed on injected keys)
    hql2 = HeroQL(spark)
    hql2.register("Exams", exams)
    mut = hql2.run("""
index Exams {
	Unique(student);
}

query AddExam(student: string, score: int)
:-	@insert Exams(student, score)
.

query UpdateExam(student: string, score: int)
:-	@update Exams(student, @score)
.

query RemoveExam(student: string)
:-	@remove Exams(student, _)
.

AddExam("zz1", 11);
AddExam("zz2", 22);
UpdateExam("zz1", 99);
RemoveExam("zz2");
query (student, score) :- Exams(student, score), student == "zz1" or student == "zz2";
""").queries[0]
    # nested partition-index declarations (Kernel/README.md
    # DATA-COLLECTION: `partition(e) { Ordered(score), Unique(t) }`) —
    # flattened to Unique(e, t) / Ordered(e, score), so ensure-set
    # addresses PER-PARTITION uniqueness: re-ensuring an existing
    # (e, t) pair is a no-op even under a different s, a fresh t in
    # the same partition inserts
    pidx = hql2.run("""
data Attend(s: int, t: int, e: int, score: int).
index Attend {
	Hash(s),
	partition(e) {
		Ordered(score),
		Unique(t)
	}
}
set Attend(1, 10, 100, 55);
set Attend(2, 20, 100, 66);
for query(s) :- Attend(s, 10, 100, 55) ( ensure set Attend(9, 10, 100, 77) );
for query(s) :- Attend(s, 10, 100, 55) ( ensure set Attend(9, 30, 100, 77) );
query (s, t, score) :- Attend(s, t, _, score);
""").queries[0]
    nb = F.lit(None).cast("long")
    a = res.queries[0].select(
        F.lit("top10").alias("part"), "student",
        F.col("score").cast("long").alias("n1"), nb.alias("n2"),
    )
    b = res.queries[1].select(
        F.lit("top3").alias("part"), "student",
        F.col("score").cast("long").alias("n1"),
        F.col("order").cast("long").alias("n2"),
    )
    c = res.queries[2].select(
        F.lit("avg3").alias("part"), "student",
        F.col("average").cast("long").alias("n1"), nb.alias("n2"),
    )
    d = mut.select(
        F.lit("mut").alias("part"), "student",
        F.col("score").cast("long").alias("n1"), nb.alias("n2"),
    )
    e = pidx.select(
        F.lit("pidx").alias("part"),
        F.col("s").cast("string").alias("student"),
        F.col("t").cast("long").alias("n1"),
        F.col("score").cast("long").alias("n2"),
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)
        .orderBy("part", "student", "n1", "n2")
    )


HEROQL_AT_DIALECT_SQL = """
WITH exams AS (
  SELECT CAST(o_custkey AS VARCHAR) AS student,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS score
  FROM orders WHERE o_custkey % 50 = 0
),
ranked AS (
  SELECT student, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, student, score) - 1 AS ord
  FROM exams
),
pranked AS (
  SELECT student, score,
         ROW_NUMBER() OVER (
           PARTITION BY student ORDER BY score DESC, student, score
         ) - 1 AS ord
  FROM exams
)
SELECT 'top10' AS part, student, score AS n1, CAST(NULL AS BIGINT) AS n2
FROM (SELECT DISTINCT student, score FROM ranked WHERE ord < 10)
UNION ALL
SELECT 'top3', student, score, ord
FROM (SELECT DISTINCT student, score, ord FROM pranked WHERE ord < 3)
UNION ALL
SELECT 'avg3', student, CAST(FLOOR(AVG(score)) AS BIGINT), CAST(NULL AS BIGINT)
FROM pranked WHERE ord < 3 GROUP BY student
UNION ALL
SELECT 'mut', student, score, CAST(NULL AS BIGINT)
FROM (VALUES ('zz1', CAST(99 AS BIGINT))) m(student, score)
UNION ALL
SELECT 'pidx', s, t, score
FROM (VALUES ('1', CAST(10 AS BIGINT), CAST(55 AS BIGINT)),
             ('2', 20, 66),
             ('9', 30, 77)) p(s, t, score)
ORDER BY part, student, n1, n2
"""


def heroql_package(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA PACKAGES as a program — the Kernel/README.md DATA
    PACKAGE / GLOBAL READONLY VALUE / TRANSACTION / USING DATA
    PACKAGE sections end-to-end:

    - `Cap <- 150000.0.` — GLOBAL READONLY VALUE (the README's
      `Zero <- 0.` shape, flush-dot terminator included);
    - `package Analytics;` with a PRIVATE rule (HasBig) and a public
      @-aggregate query (HotCount) over the SF-scaled base tables —
      consumed from `package Main using Analytics;` (draft:190 "all
      public symbol is usable"; the private one is probed and must
      refuse);
    - `package Score` with seed data, a `public transaction query`
      (two @inserts, atomic), `Students <- new Score.` (README
      verbatim shape), an inheriting instance forked `from` it,
      mutations on both, `merge` back, and a CONFLICT schedule that
      must cancel (rollback-conflicted), plus a READONLY-rebind probe.

    Scale: instances fork by immutable-DataFrame reference (O(1),
    zero copy); HotCount compiles to the standard semi-join +
    partial-agg shuffle over the orders scan; the instance legs are
    constant-cardinality driver schedules. The DURABLE twin of
    instantiate/inherit/merge is sources/branch.py (graded
    db_branch_merge). Output tag-union (leg, k1, k2, n1) with leg ∈
    {hot, inst, guard}."""
    hql = _session(spark, sf_dir, ["orders", "customer", "nation"])
    res = hql.run("""
Cap <- 150000.0;

package Analytics;
query HasBig(ckey : int) -> () :- orders(_, ckey, _, total, _, _), total >= Cap;
public query HotCount(nname : string) -> (cnt : int) :-
    customer(ckey, _, nkey, _, _),
    HasBig(ckey),
    nation(nkey, nname, _),
    @partition(nname),
    @aggregate(count(ckey)),
    cnt <- ckey
.

package Main using Analytics;
query (nname, cnt) :- HotCount(nname, cnt);
""")
    hot = res.queries[0]

    hql.run("""
package Score;
data Exams(student : string, course : string, score : int)
    index Unique(student, course);
set Exams("seed", "Math", 50);
public query AddExam(s : string, c : string, v : int) :- @insert Exams(s, c, v);
public transaction query AddPair(s : string, v : int) :-
    @insert Exams(s, "Math", v),
    @insert Exams(s, "Art", v);
public query All() -> (student : string, course : string, score : int) :-
    Exams(student, course, score);

package Main using Analytics, Score;
Students <- new Score.
Students::AddExam("alice", "Sci", 70);
Students::AddPair("bob", 90);
Wip <- new Score from Students.
Wip::AddExam("carol", "Sci", 60);
merge Wip;
""")
    guards = []
    try:  # private member across packages must refuse
        hql.run("query (c) :- HasBig(c);")
        guards.append(("guard", "private", 0))
    except HeroQLError:
        guards.append(("guard", "private", 1))
    try:  # GLOBAL READONLY VALUEs cannot rebind
        hql.run("Students <- new Score.")
        guards.append(("guard", "readonly", 0))
    except HeroQLError:
        guards.append(("guard", "readonly", 1))
    try:  # both-sides mutation since the fork must cancel the merge
        hql.run("""
Clash <- new Score from Students.
Clash::AddExam("dave", "Sci", 10);
Students::AddExam("erin", "Sci", 20);
merge Clash;
""")
        guards.append(("guard", "conflict", 0))
    except HeroQLError:
        guards.append(("guard", "conflict", 1))
    hql.run("discard Clash;")
    # the cancelled merge left the parent's own mutation intact and
    # none of the clash branch's — read the final instance state
    inst = hql.run(
        "query (s, c, v) :- Students::All(s, c, v);"
    ).queries[0]

    ns = F.lit(None).cast("string")
    out = (
        hot.select(
            F.lit("hot").alias("leg"),
            F.col("nname").alias("k1"),
            ns.alias("k2"),
            F.col("cnt").cast("long").alias("n1"),
        )
        .unionByName(
            inst.select(
                F.lit("inst").alias("leg"),
                F.col("s").alias("k1"),
                F.col("c").alias("k2"),
                F.col("v").cast("long").alias("n1"),
            )
        )
        .unionByName(
            spark.createDataFrame(guards, "leg string, k1 string, n1 long")
            .select("leg", "k1", ns.alias("k2"), "n1")
        )
    )
    return out.orderBy("leg", "k1", "k2", "n1")


_PACKAGE_CORE_SQL = """
SELECT 'hot' AS leg, n_name AS k1, CAST(NULL AS VARCHAR) AS k2,
       CAST(COUNT(*) AS BIGINT) AS n1
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice >= 150000.0)
GROUP BY n_name
UNION ALL
SELECT 'inst', s, c, v FROM (VALUES
    ('seed',  'Math', CAST(50 AS BIGINT)),
    ('alice', 'Sci',  70),
    ('bob',   'Math', 90),
    ('bob',   'Art',  90),
    ('carol', 'Sci',  60),
    ('erin',  'Sci',  20)) i(s, c, v)
UNION ALL
SELECT 'guard', g, CAST(NULL AS VARCHAR), CAST(1 AS BIGINT)
FROM (VALUES ('private'), ('readonly'), ('conflict')) g(g)
"""

HEROQL_PACKAGE_SQL = f"""
{_PACKAGE_CORE_SQL}
ORDER BY leg, k1, k2, n1
"""


def heroql_programs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered merge of heroql_rules + heroql_pipeline +
    heroql_time_travel_cdc (rotated in in round 8) + heroql_recursive
    + heroql_mutations + heroql_durable_mutations (rotated in in
    round 10) + heroql_typeactions (folded later in round 10): rule
    program, collection_query pipeline, `T@k` / `changes(T, f, t)`
    programs, the recursive Fib fixpoint, the mutation statements both
    in-memory and DURABLE (one OCC snapshot commit per statement; same
    oracle values by construction), the draft_type action dialect
    (let-constructors / ensure / if-not-set / member for), and the
    maintenance + program-log + zone-map-pushdown surface
    (heroql_maintenance_log), and — since round 12 — the CACHED-QUERY
    protocol leg (heroql_cached_query: standalone index declaration,
    hit/miss counters in the hash) and the output-argument-query leg
    (heroql_outquery: `<-` bindings, nested call, guard) — all
    compiled from HeroQL source —
    share one graded slot; constituents keep standalone entries and
    oracles."""
    nb = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    ns = F.lit(None).cast("string")
    a = heroql_rules(spark, sf_dir).select(
        F.lit("rules").alias("q"),
        F.col("nname").alias("k1"),
        F.col("why").alias("k2"),
        ns.alias("k3"),
        F.col("cust").cast("long").alias("n1"),
        nb.alias("n2"),
        nd.alias("v"),
    )
    b = heroql_pipeline(spark, sf_dir).select(
        F.lit("pipeline").alias("q"),
        ns.alias("k1"),
        ns.alias("k2"),
        ns.alias("k3"),
        F.col("suppkey").cast("long").alias("n1"),
        F.col("n_top").cast("long").alias("n2"),
        F.col("avg_top").cast("double").alias("v"),
    )
    c = heroql_time_travel_cdc(spark, sf_dir).select(
        F.lit("ttcdc").alias("q"),
        F.col("part").alias("k1"),
        F.col("note").alias("k2"),
        F.col("chg").alias("k3"),
        F.col("k").alias("n1"),
        F.col("v").alias("n2"),
        nd.alias("v"),
    )
    d = heroql_recursive(spark, sf_dir).select(
        F.lit("recursive").alias("q"),
        ns.alias("k1"), ns.alias("k2"), ns.alias("k3"),
        F.col("i").cast("long").alias("n1"),
        F.col("o").cast("long").alias("n2"),
        nd.alias("v"),
    )
    e = heroql_mutations(spark, sf_dir).select(
        F.lit("mutations").alias("q"),
        ns.alias("k1"), ns.alias("k2"), ns.alias("k3"),
        F.col("k").cast("long").alias("n1"),
        F.col("v").cast("long").alias("n2"),
        nd.alias("v"),
    )
    g = heroql_durable_mutations(spark, sf_dir).select(
        F.lit("durable").alias("q"),
        ns.alias("k1"), ns.alias("k2"), ns.alias("k3"),
        F.col("k").cast("long").alias("n1"),
        F.col("v").cast("long").alias("n2"),
        nd.alias("v"),
    )
    h = heroql_typeactions(spark, sf_dir).select(
        F.lit("typeact").alias("q"),
        F.col("tbl").alias("k1"),
        F.col("k2"),
        F.col("k3"),
        F.col("n1"),
        F.col("n2"),
        nd.alias("v"),
    )
    i = heroql_maintenance_log(spark, sf_dir).select(
        F.lit("maint").alias("q"),
        F.col("leg").alias("k1"),
        F.col("k2"),
        F.col("k3"),
        F.col("n1"),
        F.col("n2"),
        nd.alias("v"),
    )
    j = heroql_cached_query(spark, sf_dir).select(
        F.lit("cached").alias("q"),
        F.col("phase").alias("k1"),
        F.col("k").alias("k2"),
        ns.alias("k3"),
        F.col("n1"),
        F.col("n2"),
        nd.alias("v"),
    )
    k = heroql_outquery(spark, sf_dir).select(
        F.lit("outq").alias("q"),
        ns.alias("k1"), ns.alias("k2"), ns.alias("k3"),
        F.col("k").alias("n1"),
        F.col("s").alias("n2"),
        F.col("q").cast("double").alias("v"),
    )
    m = heroql_at_dialect(spark, sf_dir).select(
        F.lit("cmdq").alias("q"),
        F.col("part").alias("k1"),
        F.col("student").alias("k2"),
        ns.alias("k3"),
        F.col("n1"),
        F.col("n2"),
        nd.alias("v"),
    )
    p = heroql_package(spark, sf_dir).select(
        F.lit("pkg").alias("q"),
        F.col("leg").alias("k1"),
        F.col("k1").alias("k2"),
        F.col("k2").alias("k3"),
        F.col("n1"),
        nb.alias("n2"),
        nd.alias("v"),
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)
        .unionByName(g).unionByName(h).unionByName(i).unionByName(j)
        .unionByName(k).unionByName(m).unionByName(p)
        .orderBy("q", "n1", "k1", "k2", "k3")
    )


# HEROQL_PROGRAMS_SQL is defined at the END of this module: its ttcdc
# branch embeds HEROQL_TIME_TRAVEL_CDC_SQL, defined below.


def heroql_time_travel_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 language surface: time travel (`T@k(...)` atoms) and
    the change-data-feed relation (`changes(T, from, to, ...)`) run as
    HeroQL programs over a snapshot table with a versioned history
    that CROSSES a schema-evolution boundary (add_columns) — the
    Rewrite.md durability periphery exposed in the language rather
    than only the Python API. Self-contained (sf_dir unused; fresh
    temp table per run, deterministic content). Output tag-union:
    (part, k, v, note, chg) with part ∈ {v0, cur, cdc}."""
    import os
    import tempfile

    from pyspark.sql import functions as FF

    from herodb_spark.sources.snapshot import SnapshotTable

    import shutil

    tmp = tempfile.mkdtemp(prefix="heroql_tt_")
    try:
        seed = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
        snap = SnapshotTable.create(spark, os.path.join(tmp, "t"), seed, key_cols=["k"])
        snap.merge_upsert(spark.createDataFrame([(3, 30)], "k long, v long"))   # v1
        snap.delete_where(FF.col("k") == 2)                                     # v2
        snap.update_where(FF.col("k") == 1, {"v": FF.lit(99)})                  # v3
        snap.add_columns({"note": "string"})                                    # v4
        snap.merge_upsert(
            spark.createDataFrame([(4, 40, "x")], "k long, v long, note string")
        )                                                                       # v5
        hql = HeroQL(spark)
        hql.register_snapshot("T", snap)
        res = hql.run("""
        query (k, v) :- T@0(k, v);
        query (k, v, note) :- T(k, v, note);
        query (k, v, chg) :- changes(T, 0, 3, k, v, chg);
        """)
        ns = F.lit(None).cast("string")
        v0 = res.queries[0].select(
            F.lit("v0").alias("part"), "k", "v", ns.alias("note"), ns.alias("chg")
        )
        cur = res.queries[1].select(
            F.lit("cur").alias("part"), "k", "v", "note", ns.alias("chg")
        )
        cdc = res.queries[2].select(
            F.lit("cdc").alias("part"), "k", "v", ns.alias("note"), "chg"
        )
        # materialize (report-sized) so the staging table can be freed
        return (
            v0.unionByName(cur).unionByName(cdc)
            .orderBy("part", "k", "chg")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


HEROQL_TIME_TRAVEL_CDC_SQL = """
SELECT * FROM (VALUES
  ('v0',  CAST(1 AS BIGINT), CAST(10 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
  ('v0',  CAST(2 AS BIGINT), CAST(20 AS BIGINT), NULL, NULL),
  ('cur', CAST(1 AS BIGINT), CAST(99 AS BIGINT), NULL, NULL),
  ('cur', CAST(3 AS BIGINT), CAST(30 AS BIGINT), NULL, NULL),
  ('cur', CAST(4 AS BIGINT), CAST(40 AS BIGINT), 'x',  NULL),
  ('cdc', CAST(1 AS BIGINT), CAST(10 AS BIGINT), NULL, 'update_pre'),
  ('cdc', CAST(1 AS BIGINT), CAST(99 AS BIGINT), NULL, 'update_post'),
  ('cdc', CAST(2 AS BIGINT), CAST(20 AS BIGINT), NULL, 'delete'),
  ('cdc', CAST(3 AS BIGINT), CAST(30 AS BIGINT), NULL, 'insert')
) t(part, k, v, note, chg)
ORDER BY part, k, chg
"""


# Defined last: the ttcdc branch embeds HEROQL_TIME_TRAVEL_CDC_SQL.
HEROQL_PROGRAMS_SQL = f"""
SELECT 'rules' AS q, nname AS k1, why AS k2, CAST(NULL AS VARCHAR) AS k3,
       CAST(cust AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
       CAST(NULL AS DOUBLE) AS v
FROM ({HEROQL_RULES_SQL})
UNION ALL
SELECT 'pipeline', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(suppkey AS BIGINT),
       CAST(n_top AS BIGINT), CAST(avg_top AS DOUBLE)
FROM ({HEROQL_PIPELINE_SQL})
UNION ALL
SELECT 'ttcdc', part, note, chg, k, v, CAST(NULL AS DOUBLE)
FROM ({HEROQL_TIME_TRAVEL_CDC_SQL})
UNION ALL
SELECT 'recursive', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(i AS BIGINT), CAST(o AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM ({HEROQL_RECURSIVE_SQL})
UNION ALL
SELECT 'mutations', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(k AS BIGINT), CAST(v AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM ({HEROQL_MUTATIONS_SQL})
UNION ALL
SELECT 'durable', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(k AS BIGINT), CAST(v AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM ({HEROQL_MUTATIONS_SQL})
UNION ALL
SELECT 'typeact', tbl, k2, k3, n1, n2, CAST(NULL AS DOUBLE)
FROM ({_TYPEACTIONS_CORE_SQL})
UNION ALL
SELECT 'maint', leg, k2, k3, n1, n2, CAST(NULL AS DOUBLE)
FROM ({_MAINT_CORE_SQL})
UNION ALL
SELECT 'cached', phase, k, CAST(NULL AS VARCHAR), n1, n2, CAST(NULL AS DOUBLE)
FROM ({HEROQL_CACHED_QUERY_SQL.replace("ORDER BY phase, k", "")})
UNION ALL
SELECT 'outq', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), k, s, CAST(q AS DOUBLE)
FROM ({HEROQL_OUTQUERY_SQL.replace("ORDER BY k", "")})
UNION ALL
SELECT 'cmdq', part, student, CAST(NULL AS VARCHAR), n1, n2,
       CAST(NULL AS DOUBLE)
FROM ({HEROQL_AT_DIALECT_SQL.replace("ORDER BY part, student, n1, n2", "")})
UNION ALL
SELECT 'pkg', leg, k1, k2, n1, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM ({_PACKAGE_CORE_SQL})
ORDER BY q, n1, k1, k2, k3
"""
