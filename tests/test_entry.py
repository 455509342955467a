from __future__ import annotations

import importlib.util
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location("spark_entry", os.path.join(HERE, "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    rows_only = set(q) - set(o)
    # every rows-only op is one of the documented non-SQL-expressible
    # ones (ann_quantized_topk graduated to the brute-force oracle in
    # r11 — its exact rerank reproduces the exact top-k per SF)
    assert rows_only == {
        "dedup_simhash", "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
        "ann_ivfpq_topk",  # r12: probe-gated PQ, recall < 1 by design
        "sketch_profile", "dedup_semantic_clusters",  # KMeans: no SQL oracle
        "graph_label_propagation",  # iterated argmax: no SQL-oracle form
    }, rows_only


def test_first_fifty_slots_all_oracle_backed():
    """The round driver grades only the first 50 registry entries;
    rows-only queries must not occupy graded slots."""
    q = list(entry_mod.queries())
    o = entry_mod.oracle_sql()
    missing = [k for k in q[:50] if k not in o]
    assert missing == [], missing


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]
