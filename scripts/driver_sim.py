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


def recall_ledger(spark, sf_dir: str) -> tuple[dict, list]:
    """One-line recall table for every approximate operator (round-11
    verdict item 8 / round-12 advice): the ops that CLAIM the exact
    oracle (minhash LSH, embedding LSH, int8-quantized ANN) are HARD
    GATES — recall must be total, else a testdata regeneration has
    silently broken the exact-oracle claim and the graded hash will
    mismatch with no code change. The honestly-approximate ops
    (hyperplane/IVF/PQ ANN) are reported against their pinned floors.
    Returns ({name: recall}, [gate failures])."""
    from herodb_spark.operators import dedup as D
    from herodb_spark.operators import scale as SC
    from herodb_spark.operators import similarity as S

    out: dict[str, float] = {}
    failures: list[str] = []

    def pairs(df, a, b):
        return {(r[a], r[b]) for r in df.collect()}

    exact_j = pairs(D.ngram_jaccard_pairs(spark, sf_dir), "doc_a", "doc_b")
    lsh_j = pairs(D.minhash_lsh_pairs(spark, sf_dir), "doc_a", "doc_b")
    out["minhash_lsh"] = len(exact_j & lsh_j) / max(1, len(exact_j))
    if lsh_j != exact_j:
        failures.append(f"minhash_lsh pair set != exact ({len(lsh_j ^ exact_j)} diffs)")

    exact_e = pairs(D.embedding_neardup_pairs(spark, sf_dir), "vec_a", "vec_b")
    lsh_e = pairs(D.embedding_lsh_pairs(spark, sf_dir), "vec_a", "vec_b")
    out["emb_lsh"] = len(exact_e & lsh_e) / max(1, len(exact_e))
    if lsh_e != exact_e:
        failures.append(f"emb_lsh pair set != exact ({len(lsh_e ^ exact_e)} diffs)")

    exact_a = pairs(S.ann_bruteforce_topk(spark, sf_dir), "q_id", "neighbor_id")
    quant = pairs(S.ann_quantized_topk(spark, sf_dir), "q_id", "neighbor_id")
    out["ann_quant"] = len(exact_a & quant) / max(1, len(exact_a))
    if quant != exact_a:
        failures.append(f"ann_quant top-k != exact ({len(quant ^ exact_a)} diffs)")

    # honestly-approximate: report, floor-check only (floors match the
    # pinned per-SF assertions in tests/test_scale.py et al.)
    # floors mirror the pinned per-SF assertions (raised r13 with the
    # deeper probing: LSH multi-probe T=18 measured 0.36/0.60,
    # tests/test_dedup_similarity.py; IVF measured 0.58/0.52,
    # tests/test_scale.py; PQ 0.90/0.98; IVF-PQ ceil(k/3) probes
    # measured 0.78/0.76).
    for name, fn, floor in [
        ("ann_lsh", S.ann_lsh_topk, 0.3),
        ("ann_ivf", SC.ann_ivf_topk, 0.4),
        ("ann_pq", SC.ann_pq_topk, 0.8),
        ("ann_ivfpq", SC.ann_ivfpq_topk, 0.7),
    ]:
        approx = pairs(fn(spark, sf_dir), "q_id", "neighbor_id")
        out[name] = len(exact_a & approx) / max(1, len(exact_a))
        if out[name] < floor:
            failures.append(f"{name} recall {out[name]:.3f} < pinned floor {floor}")

    line = " ".join(
        f"{k}={v:.3f}{'*' if k in ('minhash_lsh', 'emb_lsh', 'ann_quant') else ''}"
        for k, v in out.items()
    )
    print(f"RECALL {os.path.basename(sf_dir)} {line}  (*=exact-oracle hard gate)", flush=True)
    _persist_recall(sf_dir, out)
    return out, failures


def _persist_recall(sf_dir: str, measured: dict) -> None:
    """Update RECALL.json with this run's measured ledger (keyed by sf
    basename) so bench.py can echo MEASURED recall values instead of
    hardcoded literals that go stale silently (r13 verdict item 6).
    Best-effort: a read-only checkout must not fail the gate."""
    import datetime
    import json
    import subprocess

    path = os.path.join(REPO, "RECALL.json")
    try:
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        try:
            sha = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
        except Exception:
            sha = "unknown"
        data[os.path.basename(sf_dir)] = {
            "recall": {k: round(v, 3) for k, v in measured.items()},
            "git_sha": sha,
            "run_at": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        }
        with open(path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception as e:
        print(f"RECALL ledger persist skipped: {e}", flush=True)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--recall"]
    recall_only = "--recall" in sys.argv[1:]
    sys.argv[1:] = argv
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

    if recall_only:
        _, rf = recall_ledger(spark, sf_dir)
        for f in rf:
            print(f"RECALL-GATE FAIL: {f}")
        return 1 if rf else 0

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

    if len(sys.argv) <= 2:
        # full gate run: the recall ledger is part of the verify recipe
        # (a regeneration that breaks an exact-oracle claim must fail
        # HERE, as a gate, not as a grading surprise)
        try:
            _, rf = recall_ledger(spark, sf_dir)
            failures.extend(("recall_gate", f) for f in rf)
        except Exception as e:
            failures.append(("recall_gate", str(e).split("\n")[0][:160]))

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
