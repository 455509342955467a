from __future__ import annotations

import pytest

from herodb_spark.operators import olap as O
from tests.harness import compare

CASES = [
    (O.cube_rollup, O.CUBE_ROLLUP_SQL),
    (O.pivot_events, O.PIVOT_EVENTS_SQL),
    (O.asof_join, O.ASOF_JOIN_SQL),
    (O.cube_pivot_union, O.CUBE_PIVOT_SQL),
    (O.events_analytics, O.EVENTS_ANALYTICS_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_olap_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_events_funnel_oracle(spark, sf):
    from tests.harness import compare, duckdb_con

    res = compare(O.events_funnel(spark, sf), O.EVENTS_FUNNEL_SQL, duckdb_con(sf))
    assert res["ok"], res


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_events_retention_oracle(spark, sf):
    from tests.harness import compare, duckdb_con

    res = compare(O.events_retention(spark, sf), O.EVENTS_RETENTION_SQL, duckdb_con(sf))
    assert res["ok"], res


def test_events_funnel_semantics(spark):
    """Funnel invariants: depth ordering implies duration presence,
    durations positive and within the window, depths monotone (every
    depth-3 user is also a depth-2 completion by construction)."""
    rows = O.events_funnel(spark, "/root/testdata/sf0.001").collect()
    assert rows
    w_us = O.FUNNEL_WINDOW_H * 3600 * 1_000_000
    for r in rows:
        if r.depth >= 2:
            assert r.to_step2_us is not None and 0 < r.to_step2_us <= w_us
        else:
            assert r.to_step2_us is None
        if r.depth == 3:
            assert r.to_step3_us is not None and r.to_step2_us < r.to_step3_us <= w_us
        else:
            assert r.to_step3_us is None
