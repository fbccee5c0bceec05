"""local_rows_df: JVM local relation for small driver-side row lists.

Pins the contract the metrics/lineage flush (and every other tiny
driver-rows table) relies on: exact schema, None -> NULL, empty input,
single output partition, and the Arrow fallback past the literal cap.
"""

import pyspark.sql.types as T
import pytest

from record_deduplication_spark.functions import localrel
from record_deduplication_spark.functions.localrel import local_rows_df
from record_deduplication_spark.sources.checkpoint import METRICS_SCHEMA


def test_basic_rows_schema_and_values(spark):
    df = local_rows_df(spark, [(1, "a", 1.5), (2, None, None)],
                       "id bigint, s string, x double")
    assert [f.dataType for f in df.schema.fields] == [
        T.LongType(), T.StringType(), T.DoubleType()]
    rows = sorted(df.collect())
    assert rows[0] == (1, "a", 1.5)
    assert rows[1] == (2, None, None)
    assert df.rdd.getNumPartitions() == 1


def test_empty_rows_keeps_schema(spark):
    df = local_rows_df(spark, [], METRICS_SCHEMA)
    assert df.count() == 0
    # names AND datatypes must survive the empty path: an empty flush
    # appended with a degenerate schema corrupts the metrics table
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in METRICS_SCHEMA.fields]


def test_over_wide_rows_rejected(spark):
    with pytest.raises(ValueError, match="3 values"):
        local_rows_df(spark, [(1, "a", "oops")], "id int, s string")


def test_metrics_shaped_rows_roundtrip(spark, tmp_path):
    rows = [(1, "signed", 0.0, 1.5, 1000, 1.5, 32, '{"a": 1, "q": "it\'s"}'),
            (1, "edges", 1.5, 2.0, 10, 0.5, 4, "{}")]
    df = local_rows_df(spark, rows, METRICS_SCHEMA)
    p = str(tmp_path / "m")
    df.write.mode("append").parquet(p)
    back = spark.read.parquet(p)
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
    # one part file per flush: commit metadata stays one row per flush
    import glob
    assert len(glob.glob(p + "/part-*")) == 1


def test_arrow_fallback_past_literal_cap(spark):
    n = localrel._LIT_VALUE_CAP  # 2 cols -> 2n values > cap
    rows = [(i, f"k{i}") for i in range(n)]
    df = local_rows_df(spark, rows, "id int, s string")
    assert df.count() == n
    assert df.rdd.getNumPartitions() == 1
    got = sorted((r.id, r.s) for r in df.where("id < 32").collect())
    assert got == rows[:32]


def test_all_none_column(spark):
    df = local_rows_df(spark, [(None,), (None,)], "s string")
    assert [r.s for r in df.collect()] == [None, None]


def test_array_typed_field(spark):
    df = local_rows_df(spark, [([1, 2],), ([3],)],
                       T.StructType([T.StructField(
                           "a", T.ArrayType(T.LongType()))]))
    assert [r.a for r in df.collect()] == [[1, 2], [3]]


def test_type_mismatch_fails_fast(spark):
    """ADVICE r4: the array-literal cast silently coerces what
    createDataFrame(rows, schema) rejects — swapped columns with
    castable types, float truncated into a long. Both must now fail on
    the driver before anything is written."""
    # float into LongType (would truncate)
    with pytest.raises(TypeError, match="expects bigint"):
        local_rows_df(spark, [(1.5, "a")], "id bigint, s string")
    # swapped columns with castable types
    with pytest.raises(TypeError, match="expects string|expects bigint"):
        local_rows_df(spark, [("a", 1)], "id bigint, s string")
    # bool into an integral field (Python bool subclasses int)
    with pytest.raises(TypeError, match="expects bigint"):
        local_rows_df(spark, [(True, "a")], "id bigint, s string")
    # array element type checked too
    with pytest.raises(TypeError, match="expects bigint"):
        local_rows_df(spark, [(["x"],)],
                      T.StructType([T.StructField(
                          "a", T.ArrayType(T.LongType()))]))
    # int into double is fine (exact widening); None always fine
    df = local_rows_df(spark, [(1, None)], "x double, s string")
    assert df.collect()[0] == (1.0, None)
