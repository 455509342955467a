from __future__ import annotations

import pytest

from herodb_spark.operators import pipeline as P
from tests.harness import compare

CASES = [
    (P.recursive_fib, P.RECURSIVE_FIB_SQL),
    (P.pipeline_clean_corpus, P.PIPELINE_CLEAN_CORPUS_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_pipeline_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res
