from __future__ import annotations

from pyspark.sql import functions as F

from herodb_spark.catalog import load_table
from herodb_spark.operators import scale as SC
from herodb_spark.operators import similarity as S
from tests.harness import compare


def test_skew_join_salted_oracle(spark, sf_dir, duck):
    res = compare(SC.skew_join_salted(spark, sf_dir), SC.SKEW_JOIN_SALTED_SQL, duck)
    assert res["ok"], res


def test_ann_ivf_deterministic_and_valid(spark, sf_dir):
    a = SC.ann_ivf_topk(spark, sf_dir).collect()
    b = SC.ann_ivf_topk(spark, sf_dir).collect()
    assert a == b
    assert len(a) > 0
    for r in a:
        assert r.q_id != r.neighbor_id
        assert r.rk <= SC.TOP_K


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with 2/16 probes should still recover a decent share of the
    exact top-5 (loose floor: these are near-random vectors, the worst
    case for any partitioned ANN)."""
    exact = {(r.q_id, r.neighbor_id) for r in S.ann_bruteforce_topk(spark, sf_dir).collect()}
    ivf = {(r.q_id, r.neighbor_id) for r in SC.ann_ivf_topk(spark, sf_dir).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.2, recall


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """`index Hash(key)` co-location: two tables bucketed on the join
    key join WITHOUT a shuffle (the 100 TB fact-fact join strategy).
    Uses the default warehouse dir (spark-warehouse/, gitignored) —
    spark.sql.warehouse.dir is a static conf, not settable per-test."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try:
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("o_orderpriority").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() > 0
        # bucketed scans feed the join directly - no hash exchange on the keys
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:3000]
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:3000]
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
