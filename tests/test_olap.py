from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from herodb_spark.operators import olap as O
from tests.harness import compare

CASES = [
    (O.cube_rollup, O.CUBE_ROLLUP_SQL),
    (O.pivot_events, O.PIVOT_EVENTS_SQL),
    (O.asof_join, O.ASOF_JOIN_SQL),
    (O.cube_pivot_union, O.CUBE_PIVOT_SQL),
    (O.events_analytics, O.EVENTS_ANALYTICS_SQL),
    (O.events_attribution, O.EVENTS_ATTRIBUTION_SQL),
    (O.events_transition_matrix, O.EVENTS_TRANSITION_SQL),
    (O.events_anomaly, O.EVENTS_ANOMALY_SQL),
]

from herodb_spark.operators import extra as _E

CASES.append((_E.range_join_bucketed, _E.RANGE_JOIN_BUCKETED_SQL))
CASES.append((O.events_rolling_actives, O.EVENTS_ROLLING_ACTIVES_SQL))
CASES.append((O.events_top_paths, O.EVENTS_TOP_PATHS_SQL))


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


def test_attribution_semantics(spark):
    """Attribution laws at sf0.01: the credited click is inside the
    window and belongs to the same user; lag is non-negative and under
    the window; first <= last in time; unattributed purchases have
    zero touches and NULL ids."""
    sfd = "/root/testdata/sf0.01"
    from herodb_spark.catalog import load_table

    ev = {r.event_id: r for r in load_table(spark, sfd, "events").collect()}
    out = O.events_attribution(spark, sfd).collect()
    win_us = O.ATTR_WINDOW_MIN * 60 * 1_000_000
    for r in out:
        if r.n_touches == 0:
            assert r.first_click_id is None and r.last_click_id is None
            assert r.lag_us is None
            continue
        last, first, p = ev[r.last_click_id], ev[r.first_click_id], ev[r.purchase_id]
        assert last.user_id == r.user_id == first.user_id
        assert 0 <= r.lag_us < win_us
        assert first.ts <= last.ts <= p.ts


def test_transition_matrix_is_row_stochastic(spark):
    """Transition laws at sf0.01: per cur-state, counts sum to the
    number of events of that type and probs sum to ~1 (6dp rounding);
    every state also has an explicit terminal mass unless its every
    occurrence is followed within the gap."""
    sfd = "/root/testdata/sf0.01"
    from herodb_spark.catalog import load_table

    rows = O.events_transition_matrix(spark, sfd).collect()
    per_type = {
        r.event_type: r.n
        for r in load_table(spark, sfd, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from collections import defaultdict

    cnt, prob = defaultdict(int), defaultdict(float)
    for r in rows:
        cnt[r.cur] += r.cnt
        prob[r.cur] += r.prob
    assert cnt == dict(per_type)
    for c, p in prob.items():
        assert abs(p - 1.0) < 1e-4, (c, p)


def test_events_anomaly_laws(spark):
    """Baseline contract: zscore is NULL exactly when the trailing
    window is short (< ANOM_MIN_N) or flat (variance 0); anomaly is
    true iff |z| >= ANOM_Z; n_baseline never exceeds ANOM_WINDOW; and
    recomputing any flagged bucket's z from its own trailing counts
    reproduces the column."""
    import math

    sfd = "/root/testdata/sf0.001"
    rows = O.events_anomaly(spark, sfd).collect()
    assert rows, "no buckets"
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    flagged = [r for r in rows if r.anomaly]
    assert flagged, "expected at least one anomaly in the synthetic log"
    for grp in by_type.values():
        grp.sort(key=lambda r: r.hour)
        for i, r in enumerate(grp):
            assert r.n_baseline <= O.ANOM_WINDOW
            window = grp[max(0, i - O.ANOM_WINDOW):i]
            assert r.n_baseline == len(window)
            cnts = [x.cnt for x in window]
            if len(cnts) < O.ANOM_MIN_N:
                assert r.zscore is None and not r.anomaly
                continue
            n = len(cnts)
            mean = sum(cnts) / n
            var = (sum(c * c for c in cnts) - sum(cnts) ** 2 / n) / n
            if var <= 0:
                assert r.zscore is None and not r.anomaly
            else:
                z = round((r.cnt - mean) / math.sqrt(var), 6)
                assert abs(r.zscore - z) < 1e-9, (r, z)
                assert r.anomaly == (abs(z) >= O.ANOM_Z)


def test_range_join_bucketed_laws(spark):
    """Bucket expansion is lossless vs the naive theta join: the
    bucketed plan's per-tier counts equal a direct crossJoin+filter
    recompute, overlapping tiers double-count the shared band, and
    every matched value lies inside its tier."""
    sfd = "/root/testdata/sf0.001"
    got = {r.tier: (r.n_events, r.sum_cents) for r in _E.range_join_bucketed(spark, sfd).collect()}
    from herodb_spark.catalog import load_table

    ev = load_table(spark, sfd, "events").select(F.col("value").cast("double").alias("v"))
    tiers = spark.range(_E.RJ_N_TIERS).select(
        F.col("id").cast("int").alias("tier"),
        (F.col("id") * 20.0).alias("lo"),
        (F.col("id") * 20.0 + _E.RJ_TIER_W).alias("hi"),
    )
    naive = {
        r.tier: (r.n, r.s)
        for r in ev.crossJoin(tiers)
        .where((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert got == naive
    # overlap law: a value in [20, 30) matches tiers 0 AND 1
    n_pts = ev.where((F.col("v") >= 20.0) & (F.col("v") < 30.0)).count()
    if n_pts:
        assert got[0][0] + got[1][0] >= n_pts  # shared band counted in both


def test_rolling_actives_laws(spark):
    """DAU/WAU laws: wau >= dau everywhere; wau equals the distinct
    union of the trailing window's per-day user sets (recomputed
    naively); every reported day has events."""
    sfd = "/root/testdata/sf0.001"
    rows = {r.day: (r.dau, r.wau) for r in O.events_rolling_actives(spark, sfd).collect()}
    assert rows and all(wau >= dau for dau, wau in rows.values())
    from herodb_spark.catalog import load_table
    import datetime

    ud = (
        load_table(spark, sfd, "events")
        .select("user_id", F.to_date(F.col("ts").cast("timestamp")).alias("d"))
        .distinct()
        .collect()
    )
    by_day = {}
    for r in ud:
        by_day.setdefault(r.d, set()).add(r.user_id)
    for day_s, (dau, wau) in rows.items():
        day = datetime.date.fromisoformat(day_s)
        assert dau == len(by_day[day])
        window = set()
        for k in range(O.WAU_WINDOW_D):
            window |= by_day.get(day - datetime.timedelta(days=k), set())
        assert wau == len(window), day_s
