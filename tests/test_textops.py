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


def test_text_repetition_pii_oracle(spark, sf_dir, duck):
    from herodb_spark.operators.textops import text_repetition_pii, TEXT_REPETITION_PII_SQL
    from tests.harness import compare

    res = compare(text_repetition_pii(spark, sf_dir), TEXT_REPETITION_PII_SQL, duck)
    assert res["ok"], res


def test_text_repetition_pii_redacts_injected(spark, sf_dir):
    """Every doc_id % 5 == 0 row gets exactly the injected email+phone
    redacted (2 redactions); all other rows none — the scrub logic is
    exercised on ground truth, not vacuously."""
    import pyspark.sql.functions as F
    from herodb_spark.operators.textops import text_repetition_pii

    df = text_repetition_pii(spark, sf_dir).select("doc_id", "n_redactions")
    bad = df.where(
        (F.col("doc_id") % 5 == 0) & (F.col("n_redactions") != 2)
        | (F.col("doc_id") % 5 != 0) & (F.col("n_redactions") != 0)
    )
    assert bad.isEmpty(), bad.limit(5).collect()
