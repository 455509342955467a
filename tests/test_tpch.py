from __future__ import annotations

import pytest

from herodb_spark.plans import tpch
from tests.harness import compare

CASES = [
    (tpch.q1_pricing_summary, tpch.Q1_SQL),
    (tpch.q3_shipping_priority, tpch.Q3_SQL),
    (tpch.q5_local_supplier_volume, tpch.Q5_SQL),
    (tpch.q18_large_volume_customer, tpch.Q18_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_tpch_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_q1_filter_pushdown(spark, sf_dir):
    plan = tpch.q1_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan, plan[:2000]
