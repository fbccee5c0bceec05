"""Regression pins for the round-5 engine review findings.

Each test failed (crash or wrong result) before the corresponding fix:
ANSI-mode string-id cluster_agreement, zero-norm cosine, semantic-dedup
tie rounding, lsh_topk dimension sniffing, map_distinct on NULL.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_cluster_agreement_string_ids(spark):
    """Engine-default cluster ids are STRING representatives with NULL
    noise; the old `>= 0` filter raised CAST_INVALID_INPUT under ANSI
    mode (and NULL-dropped every row with ANSI off)."""
    from record_deduplication_spark.operators.stats import cluster_agreement
    ref = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c3"), ("d", "c3"), ("e", None)],
        "clip_id string, cluster_id string")
    test = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "x"), ("d", "y"), ("e", None)],
        "clip_id string, cluster_id string")
    row = cluster_agreement(ref, test).collect()[0]
    # ref pairs: {a,b}, {c,d} = 2; test pairs: {a,b} = 1; both = 1
    assert row.n_pairs_ref == 2
    assert row.n_pairs_test == 1
    assert row.n_pairs_both == 1
    assert row.precision == 1.0
    assert row.recall == 0.5


def test_cluster_agreement_densified_ids(spark):
    """The numeric -1-noise convention still works after the fix."""
    from record_deduplication_spark.operators.stats import cluster_agreement
    ref = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", -1)], "clip_id string, cluster_id long")
    row = cluster_agreement(ref, ref).collect()[0]
    assert row.n_pairs_ref == 1 and row.f1 == 1.0


def test_cosine_zero_norm_vector_no_crash(spark):
    """An all-zero embedding passes the null/dim guards; the cosine
    division must yield NULL (excluded from every result set), not
    DIVIDE_BY_ZERO under ANSI mode."""
    from record_deduplication_spark.analysis.ann import brute_force_topk
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>")
    got = brute_force_topk(corpus, queries, k=3).collect()
    ids = sorted(r.neighbor_id for r in got)
    assert 3 not in ids  # the zero vector never enters a result set
    assert 1 in ids


def test_semdedup_tie_rounds_half_away(spark):
    """Cell pair with cosine EXACTLY 1/32 = 0.03125 (finite double) and
    tau=0.0313: SQL round() half-away gives 0.0313 >= tau -> drop the
    later row; np.round (half-to-even) gave 0.0312 -> kept both."""
    from record_deduplication_spark.analysis.semdedup import semantic_dedup
    a = [32.0, 0.0, 0.0, 0.0, 0.0]
    b = [1.0, 30.0, 11.0, 1.0, 1.0]  # |b| = sqrt(1024) = 32 exactly
    assert float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
                 ) == 0.03125
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [a, b]}))
    out = semantic_dedup(corpus, tau=0.0313, n_cells=1).toPandas()
    kept = dict(zip(out["vec_id"], out["kept"]))
    assert kept[1] is True or kept[1] == True  # noqa: E712
    assert bool(kept[2]) is False, (
        "cosine 0.03125 must round to 0.0313 (half away from zero) and "
        "meet tau=0.0313 — np.round's half-to-even kept the duplicate")


def test_lsh_topk_leading_null_embedding(spark):
    """Dimension sniffing must skip NULL/empty embeddings instead of
    len(None)-crashing on them, and raise cleanly on an all-null
    corpus."""
    from record_deduplication_spark.analysis.ann import lsh_topk
    corpus = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>")
    got = lsh_topk(corpus, queries, k=2, n_planes=2, n_tables=2)
    assert got.count() >= 1  # ran; null row just dropped

    empty = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cannot infer"):
        lsh_topk(empty, queries, k=1)


def test_map_distinct_skips_null(spark):
    from record_deduplication_spark.operators.stats import map_distinct
    df = spark.createDataFrame(
        [("A",), (None,), ("b",)], "name string")
    out = map_distinct(df, "name", str.upper, "up").toPandas()
    by = dict(zip(out["name"], out["up"]))
    assert by["A"] == "A" and by["b"] == "B"
    assert pd.isna(out[out["name"].isna()]["up"]).all()
