"""literal_df LocalRelation path: byte-identical to the parallelize path.

r14 optimization: literal_df renders provably-safe rows/types as a SQL
VALUES LocalRelation (zero tasks, zero Python-worker round-trips; a
broadcast build against it is driver-side). Anything it cannot prove
identical falls back to the old single-slice parallelize. These tests
pin (a) value/schema parity on every supported type incl. the edge
renderings, (b) that the SQL path really is a LocalRelation-only plan,
and (c) that every unprovable input falls back rather than drifting.
"""

import datetime

import pytest

from herodb_spark.session import _local_literal_sql, literal_df


def _both(spark, rows, schema):
    new = literal_df(spark, rows, schema)
    old = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    return new, old


def _assert_identical(spark, rows, schema):
    new, old = _both(spark, rows, schema)
    assert new.schema == old.schema  # incl. nullability
    assert sorted(map(tuple, new.collect()), key=repr) == sorted(
        map(tuple, old.collect()), key=repr
    )


SQL_PATH_CASES = [
    ([(-1, datetime.datetime(2024, 3, 1, 5, 30, 0, 123456), 0.0)],
     "user_id long, ts timestamp, value double"),
    ([(1, datetime.datetime(2024, 3, 1, 5, 0, tzinfo=datetime.timezone.utc), -0.0)],
     "user_id long, ts timestamp, value double"),
    ([], "user_id long, n_events long, total_value double"),
    ([("a", "b"), ("it's", None), (None, "x")], "child string, parent string"),
    ([(1, True), (2, False), (3, None)], "k int, flag boolean"),
    ([(datetime.date(2024, 2, 29),)], "d date"),
    ([(1.5,), (None,)], "f float"),
    ([(127, -128)], "a tinyint, b smallint"),
    ([(2**63 - 1, -(2**63))], "a bigint, b bigint"),
    ([(0.1 + 0.2,), (1e-308,), (-1.7976931348623157e308,)], "v double"),
]

FALLBACK_CASES = [
    # non-finite double: no SQL literal rendering is provably identical
    ([(1, 2.5), (2, float("inf"))], "k int, v double"),
    # outside printable ASCII (escape semantics vary with session conf)
    ([("emoji \U0001F600", "y")], "child string, parent string"),
    ([("tab\tand\nnewline", "y")], "child string, parent string"),
    ([("back\\slash", "y")], "child string, parent string"),
    # unsupported column type
    ([(1, [1, 2])], "k int, arr array<int>"),
]


@pytest.mark.parametrize("rows,schema", SQL_PATH_CASES)
def test_sql_path_identical_and_local(spark, rows, schema):
    assert _local_literal_sql(rows, schema) is not None
    _assert_identical(spark, rows, schema)
    plan = (
        literal_df(spark, rows, schema)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LocalRelation" in plan and "Scan" not in plan


@pytest.mark.parametrize("rows,schema", FALLBACK_CASES)
def test_unprovable_inputs_fall_back_identically(spark, rows, schema):
    assert _local_literal_sql(rows, schema) is None
    _assert_identical(spark, rows, schema)


def test_int_wider_than_bigint_rejected_by_renderer():
    # both execution paths raise on overflow; the renderer must simply
    # refuse so the failure mode stays the old path's
    assert _local_literal_sql([(2**63,)], "v bigint") is None


def test_struct_type_schema_object(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    st = StructType(
        [StructField("k", LongType()), StructField("name", StringType())]
    )
    assert _local_literal_sql([(1, "a")], st) is not None
    _assert_identical(spark, [(1, "a"), (2, None)], st)
