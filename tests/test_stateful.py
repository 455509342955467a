from __future__ import annotations

from herodb_spark.catalog import load_table
from herodb_spark.streaming import ops as SO
from herodb_spark.streaming import stateful as SS


def test_stateful_running_spend_matches_batch(spark, sf_dir):
    stream_in = SO.stream_events(spark, sf_dir)
    q = (
        SS.running_spend_stream(stream_in)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode may emit once per micro-batch per key; keep the last
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_state").collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in SS.running_spend_batch(load_table(spark, sf_dir, "events")).collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        gn, gt = got[uid]
        assert gn == n, (uid, gn, n)
        assert abs(gt - total) < 0.05, (uid, gt, total)
