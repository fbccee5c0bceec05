"""Driver-side rows -> DataFrame without the pickled-RDD tax.

``spark.createDataFrame(list_of_rows)`` parallelizes the PICKLED rows
across ``defaultParallelism`` partitions; every action on the result
then pays one Python-worker handshake per partition — and a
``.coalesce(1)`` (the natural move before writing a tiny metadata
table) computes all parent partitions SEQUENTIALLY in one task, i.e.
32 handshakes back to back. Measured on local[32]: a 6-row metrics
flush write costs 4.5–9 s that way, ~0.2 s as a JVM local relation.
On a real cluster the stakes are different but the fix is the same:
a metadata write should not start Python processes on executors.

:func:`local_rows_df` therefore builds SMALL row lists as a pure-JVM
plan — one array literal per column, ``arrays_zip`` + ``inline`` over
a single-partition ``range(1)`` — and routes larger lists through the
Arrow ``createDataFrame(pandas)`` overload (one Arrow batch shipped to
the JVM; py4j converts literal lists element-by-element, so the
literal route itself degrades past a few thousand values).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lit() ships each Python list to the JVM element-by-element over py4j
# (~1 ms per value); past this many TOTAL values the Arrow batch path
# is faster and keeps the plan small.
_LIT_VALUE_CAP = 2048

# value-type acceptance per Spark type class: the cast(ArrayType) below
# silently COERCES what createDataFrame(rows, schema) would reject
# (float truncated into LongType, swapped columns with castable types)
# — so a caller bug would write corrupted metrics/model rows instead of
# failing fast on the driver (ADVICE r4). bool is excluded from the
# integral types (Python bool subclasses int).
_ACCEPT: list[tuple[type, tuple[type, ...]]] = [
    (T.StringType, (str,)),
    (T.BooleanType, (bool,)),
    (T.IntegralType, (int,)),
    (T.FractionalType, (int, float)),  # int widens exactly at our scales
]


def _check_value(v, dt: T.DataType, field: str) -> None:
    if v is None:
        return
    if isinstance(dt, T.ArrayType):
        if not isinstance(v, (list, tuple)):
            raise TypeError(
                f"local_rows_df: field {field!r} expects a sequence for "
                f"{dt.simpleString()}, got {type(v).__name__}: {v!r}")
        for e in v:
            _check_value(e, dt.elementType, field)
        return
    for spark_t, py_ts in _ACCEPT:
        if isinstance(dt, spark_t):
            if not isinstance(v, py_ts) or (
                    isinstance(v, bool) and bool not in py_ts):
                raise TypeError(
                    f"local_rows_df: field {field!r} expects "
                    f"{dt.simpleString()}, got {type(v).__name__}: {v!r}")
            return
    # other types (timestamp, binary, ...) pass through unchecked —
    # nothing in this repo routes them here


_warned_no_arrow = False


def local_rows_df(spark: SparkSession, rows: Iterable[Sequence],
                  schema: T.StructType | str) -> DataFrame:
    """Single-partition DataFrame from driver-side rows, JVM-side.

    ``schema`` is a StructType or DDL string; scalar and array-typed
    fields are supported (lit() builds nested array literals too).
    ``rows`` may be empty; ``None`` values are preserved as SQL NULLs.
    Values are pre-validated against the schema (width AND type) so a
    caller bug fails fast on the driver instead of being silently
    coerced by the array cast.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    rows = [tuple(r) for r in rows]
    n_fields = len(schema.fields)
    for r in rows:
        # fail fast like createDataFrame(rows, schema) would — the
        # zip() below would otherwise silently TRUNCATE over-wide rows
        if len(r) != n_fields:
            raise ValueError(
                f"local_rows_df: row has {len(r)} values, schema has "
                f"{n_fields} fields: {r!r}")
        for v, f in zip(r, schema.fields):
            _check_value(v, f.dataType, f.name)
    if rows and len(rows) * n_fields > _LIT_VALUE_CAP:
        import pandas as pd
        # the Arrow overload needs arrow.pyspark.enabled (session.py
        # sets it); without it createDataFrame(pandas) silently falls
        # back to the pickled-RDD path — exactly the sequential
        # Python-worker tax this module exists to avoid. Warn once
        # (perf only, correctness unaffected) — ADVICE r4.
        global _warned_no_arrow
        if not _warned_no_arrow and spark.conf.get(
                "spark.sql.execution.arrow.pyspark.enabled",
                "false").lower() != "true":
            import warnings
            warnings.warn(
                "local_rows_df: spark.sql.execution.arrow.pyspark.enabled "
                "is off — large driver-row tables will take the slow "
                "pickled-RDD path (build the session via "
                "record_deduplication_spark.session.build_session)",
                RuntimeWarning, stacklevel=2)
            _warned_no_arrow = True
        pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields],
                           dtype=object)
        # Arrow path: batches are built driver-side and handed to the
        # JVM as bytes — execution never starts a Python worker, so
        # coalesce(1) here is a cheap JVM iterator concat
        return spark.createDataFrame(pdf, schema).coalesce(1)
    cols = list(zip(*rows)) if rows else [() for _ in schema.fields]
    zipped = F.arrays_zip(*[
        F.lit(list(vals)).cast(T.ArrayType(f.dataType)).alias(f.name)
        for f, vals in zip(schema.fields, cols)])
    return (spark.range(0, 1, 1, 1).select(F.inline(zipped))
            .toDF(*[f.name for f in schema.fields]))
