#!/usr/bin/env python
"""Simulate the round driver: vanilla SparkSession (none of our tuned
confs), entry() smoke check, then every queries() entry at the given
sf_dir compared against its oracle_sql() through DuckDB — the same
gate as CORRECTNESS_r{N}.json. Usage:

    python scripts/driver_sim.py [sf_dir] [query_name ...]

With query names, only those registry entries run (fast iteration on
one operator); the full run remains the gate.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from tests.harness import compare, duckdb_con  # noqa: E402

spec = importlib.util.spec_from_file_location("spark_entry", os.path.join(REPO, "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # deliberately NOT herodb_spark.session.get_spark(): the driver
    # builds its own plain session.
    spark = (
        SparkSession.builder.appName("driver_sim")
        .master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}", flush=True)

    con = duckdb_con(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if len(sys.argv) > 2:
        wanted = set(sys.argv[2:])
        unknown = wanted - queries.keys()
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        queries = {k: v for k, v in queries.items() if k in wanted}
    failures = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                res = compare(sdf, oracles[name], con)
                status = "MATCH" if res["ok"] else "MISMATCH"
                if not res["ok"]:
                    failures.append((name, res["detail"]))
                extra = f"rows={res['spark_rows']}/{res['duck_rows']}"
            else:
                n = sdf.count()
                status, extra = "ROWS_ONLY", f"rows={n}"
        except Exception as e:  # driver records errors per query
            status, extra = "ERROR", str(e).split("\n")[0][:160]
            failures.append((name, extra))
        print(f"{status:9s} {name:28s} {extra}  ({time.perf_counter() - t0:.1f}s)", flush=True)

    print(f"\n{len(queries) - len(failures)}/{len(queries)} OK")
    for name, det in failures:
        print(f"FAIL {name}: {det}")
    # provenance footer: the run is attributable to the exact code and
    # data it verified (same contract as bench.py's stamped JSON)
    import json

    from bench import provenance

    print(json.dumps({"ok": len(queries) - len(failures), "total": len(queries),
                      "sf": sf_dir, **provenance()}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
