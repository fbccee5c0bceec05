"""Similarity search over an embedding column (`array<float>`).

Two paths per the build brief:
- brute-force cosine top-k baseline: pure column expressions
  (`zip_with` + `aggregate` dot products, JVM-side codegen) over a
  broadcast of the (small) query set against the full corpus;
- LSH-bucketed scale path: random-hyperplane signs bucket the corpus;
  queries probe only their own bucket(s) — the candidate join becomes
  an equi-join on (plane-set, bucket signature) instead of a cross
  join. Recall is tunable via n_tables (independent plane sets).

At 100 TB the broadcast side must be the query set (bounded), never
the corpus; both implementations below honor that.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos_expr(a: str, b: str):
    dot = F.aggregate(F.zip_with(F.col(a), F.col(b),
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0),
                            lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0),
                            lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     max_queries: int = 10_000) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, window top-k.

    INTENTIONALLY a broadcast nested-loop baseline — cost is
    |queries| x |corpus| dot products. The guard bounds the broadcast
    side so a caller cannot accidentally run it with a large query set
    (use `lsh_topk`, the scale path, instead).

    Returns (query_id, neighbor_id, cosine, rank)."""
    nq = queries.count()
    if nq > max_queries:
        raise ValueError(
            f"brute_force_topk is the exact cartesian BASELINE: {nq} "
            f"queries > max_queries={max_queries}. Use lsh_topk for "
            f"large query sets, or raise max_queries explicitly.")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", _cos_expr("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_tables, n_planes, dim)).tolist()


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-pattern bucket id for one table: sum_i (dot(v, p_i) > 0) << i."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array([F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(F.col(vec_col), arr,
                                     lambda x, y: x.cast("double") * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_tables: int = 4, seed: int = 42,
             dim: int | None = None) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Candidates = corpus rows sharing a (table, bucket) with the query;
    exact cosine re-ranks candidates. The cross join is replaced by an
    equi-join on (table, bucket) — the 100 TB-safe plan."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    tables = _hyperplanes(dim, n_planes, n_tables, seed)

    def bucketize(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        parts = []
        for t, planes in enumerate(tables):
            parts.append(df.select(
                F.col(idc).alias(out_id), F.col(vec_col).alias(f"{out_id}_v"),
                F.lit(t).alias("tbl"),
                _bucket_expr(vec_col, planes).alias("bucket")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cb = bucketize(corpus, id_col, "neighbor_id")
    qb = bucketize(queries, id_col, "query_id")
    cand = (cb.join(qb, ["tbl", "bucket"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    F.col("query_id_v").alias("qv"),
                    F.col("neighbor_id_v").alias("cv"))
            .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.withColumn("cosine", _cos_expr("qv", "cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))
