from __future__ import annotations

import pytest

from herodb_spark.operators import olap as O
from tests.harness import compare

CASES = [
    (O.cube_rollup, O.CUBE_ROLLUP_SQL),
    (O.pivot_events, O.PIVOT_EVENTS_SQL),
    (O.asof_join, O.ASOF_JOIN_SQL),
    (O.cube_pivot_union, O.CUBE_PIVOT_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_olap_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res
