"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship — MinHash-LSH near-dup detection + connected-
                components clustering over the sf0.001 documents table
                (the engine's core dataflow on driver-provided data).
queries()     : one entry per implemented operator family from
                SURVEY.md §2 + the training-data-pipeline extras; each
                has an exactly-matching DuckDB twin in oracle_sql()
                (see record_deduplication_spark/analysis/gate_queries.py
                for the pairing rules that make the value-hashes equal:
                md5-based 60-bit hashing, integer-cents money, rounded
                single-division ratios, aliased columns).
oracle_sql()  : the DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from record_deduplication_spark.analysis import gate_queries as G
from record_deduplication_spark.config import DEFAULT_CONFIG
from record_deduplication_spark.operators.cc import assign_clusters, connected_components


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: LSH candidate pairs over
    document shingles, exact-Jaccard verify, then large-star/small-star
    connected components -> (doc_id, cluster_id) for co-clustered docs."""
    sf_dir = "/root/testdata/sf0.001"
    pairs = G.run_spark(spark, sf_dir, "minhash_lsh_pairs")
    edges = pairs.select(F.col("id_1").cast("string").alias("id_1"),
                         F.col("id_2").cast("string").alias("id_2"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    comps = connected_components(edges, DEFAULT_CONFIG)
    clusters = assign_clusters(
        docs.select(F.col("doc_id").cast("string").alias("clip_id")), comps,
        DEFAULT_CONFIG, densify=True)
    return (clusters
            .select(F.col("clip_id").cast("long").alias("doc_id"),
                    F.col("cluster_id").cast("long").alias("cluster_id"))
            .orderBy("doc_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def make(name: str):
        return lambda spark, sf_dir: G.run_spark(spark, sf_dir, name)
    return {name: make(name) for name in G.all_names()}


def oracle_sql() -> dict[str, str]:
    return {name: G.duckdb_sql(name) for name in G.all_names()}
