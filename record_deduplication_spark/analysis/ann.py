"""Similarity search over an embedding column (`array<float>`).

Three paths per the build brief:
- brute-force cosine top-k baseline: pure column expressions
  (`zip_with` + `aggregate` dot products, JVM-side codegen) over a
  broadcast of the (small) query set against the full corpus;
- LSH-bucketed scale path: random-hyperplane signs bucket the corpus;
  queries probe only their own bucket(s) — the candidate join becomes
  an equi-join on (plane-set, bucket signature) instead of a cross
  join. Recall is tunable via n_tables (independent plane sets), at
  the cost of storing the corpus n_tables times in the bucket table.
- IVF scale path: spherical-kmeans coarse quantizer fit driver-side
  on a BOUNDED sample, centroids broadcast; the corpus is stored ONCE
  (each vector in its nearest cell) and only the query side fans out
  (n_probe nearest cells each) — recall/cost is tuned per-query, not
  by replicating the corpus.

At 100 TB the broadcast side must be the query set (bounded), never
the corpus; all implementations below honor that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    # all-zero vectors (failed embed, padding) pass the null/dim row
    # guards but have no defined cosine: NULL, not DIVIDE_BY_ZERO under
    # ANSI mode — every topk path filters cosine IS NOT NULL before
    # ranking, and NULL fails any >= threshold, so zero vectors never
    # enter a result set
    denom = na * nb
    return F.when(denom > 0, dot / denom)


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
            .where(F.col("cosine").isNotNull())  # zero-norm: no defined cosine
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_tables, n_planes, dim))


def _bucket_sig_udf(tables):
    """ALL tables' sign-pattern bucket ids in ONE Arrow matmul per
    batch: bucket[t] = sum_i (dot(v, p_ti) > 0) << i.

    Replaces the r1-r3 per-plane expression builder, which baked
    n_tables x n_planes x dim `F.lit` leaves into the plan — fine at
    test dims (<=16), but at real embedding dims (768-4096) that is
    25k-130k literal expressions per bucketize, the same
    codegen-blowup class as the >1k-literal In-predicate
    StackOverflow capped in operators/verify.py (VERDICT r3 #5). The
    plane matrix now rides the UDF closure (broadcast once per
    executor), and the plan carries a single Arrow node regardless of
    dim."""
    from pyspark.sql.functions import pandas_udf

    p = np.asarray(tables, dtype=np.float64)          # (T, B, D)
    n_tables, n_planes, _dim = p.shape
    flat = p.reshape(n_tables * n_planes, -1)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.array(v.tolist(), dtype=np.float64)    # (n, D)
        bits = (x @ flat.T) > 0                       # (n, T*B)
        bits = bits.reshape(len(x), n_tables, n_planes)
        buckets = (bits * weights).sum(axis=2)        # (n, T)
        return pd.Series(list(buckets))

    return sig


def fit_ivf_centroids(corpus: DataFrame, n_cells: int = 64,
                      vec_col: str = "embedding", sample_n: int = 50_000,
                      n_iters: int = 15, seed: int = 42) -> np.ndarray:
    """Fit the IVF coarse quantizer: spherical k-means on a bounded
    driver-side sample (k-means++ init, Lloyd iterations on the unit
    sphere). The model is tiny — (n_cells, dim) floats — and is
    BROADCAST to executors; only the sample, never the corpus, reaches
    the driver. At 10^12 rows a 50k uniform sample still estimates
    cell centroids to well within the n_probe recall slack."""
    frac_df = corpus.select(vec_col).where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    n = frac_df.count()
    if n == 0:
        raise ValueError(
            "fit_ivf_centroids: corpus has no non-empty embedding rows "
            f"in column {vec_col!r} — nothing to fit the quantizer on")
    if n > sample_n:
        frac_df = frac_df.sample(fraction=min(1.0, 1.2 * sample_n / n),
                                 seed=seed).limit(sample_n)
    vals = frac_df.toPandas()[vec_col].tolist()
    # ragged guard: a mixed-dimension corpus (partial re-embed, schema
    # migration) would make np.array build an object array and norm
    # raise — fit on the MODAL dimension and let ivf_topk's size filter
    # drop the off-dimension rows consistently
    lens = [len(v) for v in vals]
    modal = max(set(lens), key=lens.count)
    vals = [v for v, l in zip(vals, lens) if l == modal]
    x = np.array(vals, dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_cells, len(x))
    # k-means++ seeding on cosine distance (= squared euclidean on sphere)
    cents = [x[rng.integers(len(x))]]
    for _ in range(1, k):
        d2 = np.min([np.maximum(2.0 - 2.0 * (x @ c), 0.0) for c in cents],
                    axis=0)
        tot = d2.sum()
        if tot <= 0:
            cents.append(x[rng.integers(len(x))])
            continue
        cents.append(x[rng.choice(len(x), p=d2 / tot)])
    c = np.array(cents)
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            m = x[assign == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def _probe_cells_udf(centroids: np.ndarray, n_probe: int):
    """Arrow-vectorized nearest-cells assignment: one matmul per batch
    (never per-row Python), returns the n_probe best cell ids."""
    from pyspark.sql.functions import pandas_udf

    c = centroids.astype(np.float64)

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ c.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series(list(top.astype(np.int32)))

    return probe


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 64, n_probe: int = 4,
             centroids: np.ndarray | None = None,
             seed: int = 42) -> DataFrame:
    """Approximate cosine top-k via an IVF coarse quantizer.

    Plan shape (the 100 TB story vs `lsh_topk`): the corpus bucket
    table holds each vector ONCE (its nearest cell — `n_probe=1` on
    the corpus side); queries explode into their `n_probe` nearest
    cells and the candidate join is an equi-join on `cell`. Corpus
    storage is 1x regardless of recall tuning; raising `n_probe`
    multiplies only the (small) probe side. Dense cells are a skew
    hazard like any hot join key — AQE skew-join or salting the cell
    id applies unchanged; at cluster scale, pre-partitioning/bucketing
    the corpus table BY cell makes the probe a co-located join."""
    if centroids is None:
        centroids = fit_ivf_centroids(corpus, n_cells, vec_col, seed=seed)

    c_assign = _probe_cells_udf(centroids, 1)
    q_assign = _probe_cells_udf(centroids, n_probe)
    # NULL/empty/off-dimension embeddings are dropped BEFORE the Arrow
    # UDF: one bad row would otherwise make np.array(v.tolist()) ragged
    # and np.linalg.norm(x, axis=1) raise, killing the whole job. The
    # quantizer's dimension is the contract — rows of any other size
    # cannot be scored against its centroids.
    dim = int(centroids.shape[1])
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    cb = (corpus.where(ok)
          .select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("cv"),
                  c_assign(F.col(vec_col))[0].alias("cell")))
    qb = (queries.where(ok)
          .select(F.col(id_col).alias("query_id"),
                  F.col(vec_col).alias("qv"),
                  F.explode(q_assign(F.col(vec_col))).alias("cell")))
    scored = (cb.join(qb, "cell")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", _cos_expr("qv", "cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored
            .where(F.col("cosine").isNotNull())  # zero-norm: no defined cosine
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_tables: int = 4, seed: int = 42,
             dim: int | None = None) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Candidates = corpus rows sharing a (table, bucket) with the query;
    exact cosine re-ranks candidates. The cross join is replaced by an
    equi-join on (table, bucket) — the 100 TB-safe plan."""
    if dim is None:
        # first row with a non-null, non-empty vector — first()[0]
        # alone TypeErrors on a leading NULL embedding (the exact row
        # class bucketize() drops) and on an empty corpus
        row = (corpus.where(F.col(vec_col).isNotNull()
                            & (F.size(vec_col) > 0))
               .select(vec_col).first())
        if row is None:
            raise ValueError(
                "lsh_topk: cannot infer embedding dimension — corpus "
                "has no non-null, non-empty vectors; pass dim=")
        dim = len(row[0])
    tables = _hyperplanes(dim, n_planes, n_tables, seed)
    sig = _bucket_sig_udf(tables)

    def bucketize(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        # null/empty/off-dimension rows are dropped BEFORE the Arrow
        # UDF (one ragged row would crash the whole batch's np.array;
        # a vector of another dimension cannot be hashed against these
        # planes anyway), then ONE scan computes every table's bucket
        # and posexplode fans out the (tbl, bucket) keys — the r1-r3
        # shape re-scanned the input n_tables times through a union.
        ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
        return (df.where(ok)
                .select(F.col(idc).alias(out_id),
                        F.col(vec_col).alias(f"{out_id}_v"),
                        F.posexplode(sig(F.col(vec_col)))
                        .alias("tbl", "bucket")))

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
            .where(F.col("cosine").isNotNull())  # zero-norm: no defined cosine
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))
