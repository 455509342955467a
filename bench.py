#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec}, "sf": dir}.

Each query is fully materialized via a count() over the final plan
(no driver-side collect of payloads). One warm-up run of the smallest
query absorbs JVM/codegen startup so timings measure the plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from herodb_spark.session import get_spark
from herodb_spark.operators import dedup as D
from herodb_spark.operators import graphops as G
from herodb_spark.operators import similarity as S
from herodb_spark.operators import streamops as ST
from herodb_spark.plans import tpch

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = {
    "tpch_q1": tpch.q1_pricing_summary,
    "tpch_q3": tpch.q3_shipping_priority,
    "tpch_q5": tpch.q5_local_supplier_volume,
    "tpch_q18": tpch.q18_large_volume_customer,
    "dedup_minhash_lsh": D.minhash_lsh_pairs,
    "ann_bruteforce_topk": S.ann_bruteforce_topk,
    "graph_pagerank": G.graph_pagerank,
    "stream_sessionize": ST.stream_sessionize,
}


def main() -> None:
    spark = get_spark("herodb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer caches + codegen
    tpch.q1_pricing_summary(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name, fn in BENCH_QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "herodb_spark headline suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
