from __future__ import annotations

import pytest

from herodb_spark.operators import textops as X
from tests.harness import compare

CASES = [
    (X.token_count, X.TOKEN_COUNT_SQL),
    (X.quality_score, X.QUALITY_SCORE_SQL),
    (X.lang_id, X.LANG_ID_SQL),
    (X.fingerprint, X.FINGERPRINT_SQL),
    (X.text_analysis, X.TEXT_ANALYSIS_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_textops_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res
