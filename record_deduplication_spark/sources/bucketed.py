"""Bucketed corpus layout: co-located joins without a shuffle.

The pipeline joins on `clip_id` over and over (payload re-join in
verify_audio, cluster-record output join C15, pair-context expansion
R1). At 10^12 rows each of those is a full shuffle of the probe side —
unless the corpus table is BUCKETED by the join key: Spark's
bucketBy(n, key) writes each bucket as its own file set, records
bucket spec in the catalog, and a join of two tables bucketed the same
way plans as a zero-Exchange SortMergeJoin (asserted in
tests/test_plans.py::test_bucketed_join_is_shuffle_free).

The reference has no analog (pandas is single-process); this is the
Spark-native equivalent of its "load once, operate in place" layout
(/root/reference/src/io/file_handler.py:39-59 reads whole CSVs into
memory). On Iceberg deployments the same role is played by a
`bucket(n, clip_id)` partition transform.

Sizing: pick n_buckets so one bucket of the LARGEST co-bucketed table
is a few hundred MB (a task's worth). Buckets are fixed at write time
— they must be sized for the corpus's target scale, not its current
size; re-bucketing is a full rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str = "clip_id",
                   n_buckets: int = 64, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist `df` bucketed (and optionally sorted) by `key`.

    Sorting within buckets lets the co-located join skip its Sort as
    well on readers that propagate the ordering, and keeps id-range
    scans (fetch_payloads' In-pushdown) page-clustered."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (catalog lookup keeps the bucket
    spec; a plain parquet path read would lose it)."""
    return spark.table(table)
