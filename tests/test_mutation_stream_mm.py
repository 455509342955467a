from __future__ import annotations

import pytest

from herodb_spark.operators import multimodal as MM
from herodb_spark.operators import mutation as MU
from herodb_spark.operators import streamops as ST
from tests.harness import compare

CASES = [
    (MU.upsert_table, MU.UPSERT_TABLE_SQL),
    (MU.update_where, MU.UPDATE_WHERE_SQL),
    (MU.delete_where, MU.DELETE_WHERE_SQL),
    (ST.stream_tumbling_agg, ST.STREAM_TUMBLING_AGG_SQL),
    (ST.stream_sessionize, ST.STREAM_SESSIONIZE_SQL),
    (ST.stream_late_dedup, ST.STREAM_LATE_DEDUP_SQL),
    (MM.mm_binary_meta, MM.MM_BINARY_META_SQL),
    (MM.mm_frame_sample, MM.MM_FRAME_SAMPLE_SQL),
    (MU.mutation_statements, MU.MUTATION_STATEMENTS_SQL),
    (ST.stream_window_aggs, ST.STREAM_WINDOW_AGGS_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[f.__name__ for f, _ in CASES])
def test_oracle(spark, sf_dir, duck, fn, sql):
    res = compare(fn(spark, sf_dir), sql, duck)
    assert res["ok"], res


def test_corpus_is_ascii(duck):
    """mm_frame_sample's oracle equates byte offsets with char offsets."""
    n = duck.sql(r"SELECT count(*) FROM documents WHERE text ~ '[^\x00-\x7f]'").fetchone()[0]
    assert n == 0


def test_corpus_fits_frame_series_bound(duck):
    """mm_frame_sample's oracle enumerates a constant 64 KiB index
    range (DuckDB generate_series can't be lateral)."""
    n = duck.sql("SELECT max(octet_length(encode(text))) FROM documents").fetchone()[0]
    assert n < 65536


def test_decode_blob_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_blob(b"xx", "image")


def test_mm_resize_features_oracle(spark, sf_dir, duck):
    from herodb_spark.operators import multimodal as MM
    from tests.harness import compare

    res = compare(MM.mm_resize_features(spark, sf_dir), MM.MM_RESIZE_FEATURES_SQL, duck)
    assert res["ok"], res


def test_mm_resize_features_empty_blob_matches_oracle(spark, tmp_path):
    """Regression: a zero-byte blob must yield NO rows (the oracle's
    position filter emits none), not a row of zero-count bins."""
    import duckdb

    from herodb_spark.operators import multimodal as MM
    from tests.harness import compare

    rows = [
        (1, "", "src0", "en", 0.9),
        (2, "some real text here", "src1", "en", 0.9),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string, lang string, quality double").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    res = compare(MM.mm_resize_features(spark, str(tmp_path)), MM.MM_RESIZE_FEATURES_SQL, con)
    assert res["ok"], res
    out = MM.mm_resize_features(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in out} == {2}
