from __future__ import annotations

import pytest

from herodb_spark.plans import tpch, tpch_more
from tests.harness import compare

CASES = [
    (tpch.q1_pricing_summary, tpch.Q1_SQL),
    (tpch.q3_shipping_priority, tpch.Q3_SQL),
    (tpch.q5_local_supplier_volume, tpch.Q5_SQL),
    (tpch.q18_large_volume_customer, tpch.Q18_SQL),
    (tpch.q4_order_priority, tpch.Q4_SQL),
    (tpch.q6_revenue_forecast, tpch.Q6_SQL),
    (tpch.q12_ship_delay, tpch.Q12_SQL),
] + [(fn, sql) for fn, sql in tpch_more.ALL_QUERIES.values()] + [
    (tpch_more.q13_q16_q22_union, tpch_more.Q13_Q16_Q22_SQL),
    (tpch_more.q14_q15_q19_union, tpch_more.Q14_Q15_Q19_SQL),
    (tpch_more.q2_q11_q17_union, tpch_more.Q2_Q11_Q17_SQL),
    (tpch_more.q8_q9_q20_q21_union, tpch_more.Q8_Q9_Q20_Q21_SQL),
]


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6's whole cost is the scan: every predicate must reach the
    parquet reader and the schema must prune to the 4 used columns.
    (formatted explain — the simple plan string truncates long
    FileScan lines, hiding PushedFilters.)"""
    df = tpch.q6_revenue_forecast(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PushedFilters" in plan
    import re

    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    read_cols = {c.split(":")[0] for c in schema.split(",")}
    assert read_cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, read_cols


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_tpch_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_q1_filter_pushdown(spark, sf_dir):
    plan = tpch.q1_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan, plan[:2000]
