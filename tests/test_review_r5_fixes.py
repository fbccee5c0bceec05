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


# ---------------------------------------------------------------------------
# second review batch: checkpoint/streaming/audio/pipeline seams
# ---------------------------------------------------------------------------

def test_next_run_id_survives_torn_first_flush(spark, tmp_path):
    """A crash during the FIRST metrics flush leaves metrics/ holding
    only _temporary; next_run_id must return 1 instead of raising
    UNABLE_TO_INFER_SCHEMA forever (bricked resume)."""
    import os
    from record_deduplication_spark.sources.checkpoint import CheckpointStore
    st = CheckpointStore(spark, str(tmp_path / "wd"))
    os.makedirs(os.path.join(st.path("metrics"), "_temporary"))
    assert st.next_run_id() == 1
    # and a real flush afterwards works + bumps the id
    st.log(1, "stage", 0.0, 1, 1)
    st.flush()
    assert st.next_run_id() == 2


def test_stream_null_fp_rows_pass_through_as_novel(spark, tmp_path):
    """NULL fingerprints must not be int64-cast (NaN -> INT64_MIN would
    collapse all of them into one 'duplicate'): each passes through
    novel=True and never enters state."""
    import os
    import pandas as pd
    from pyspark.sql import types as T
    from record_deduplication_spark.streaming.dedup_stream import (
        near_dup_suppress_stream)
    base = str(tmp_path / "s")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "o", "c"))
    os.makedirs(in_dir)
    pd.DataFrame({"clip_id": ["n1", "n2", "r1"],
                  "block_key": ["A", "A", "A"],
                  "fp": pd.array([None, None, 7], dtype="Int64")}
                 ).to_parquet(os.path.join(in_dir, "f0.parquet"), index=False)
    schema = T.StructType([T.StructField("clip_id", T.StringType()),
                           T.StructField("block_key", T.StringType()),
                           T.StructField("fp", T.LongType())])
    q = (near_dup_suppress_stream(
            spark.readStream.schema(schema).parquet(in_dir), hamming_k=3)
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(out_dir).toPandas().set_index("clip_id")
    assert bool(out.loc["n1", "novel"]) and bool(out.loc["n2", "novel"])
    assert bool(out.loc["r1", "novel"])
    # state holds ONLY the real fingerprint
    assert int(out["n_seen"].max()) == 1


def test_exact_dedup_stream_null_bytes_not_collapsed(spark, tmp_path):
    """Two distinct NULL-bytes clips sharing a transcript must both
    survive exact dedup (concat_ws would have silently keyed them by
    transcript alone)."""
    import os
    import pandas as pd
    from pyspark.sql import types as T
    from record_deduplication_spark.streaming.dedup_stream import (
        exact_dedup_stream)
    base = str(tmp_path / "s")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "o", "c"))
    os.makedirs(in_dir)
    pd.DataFrame({"clip_id": ["x1", "x2", "y1"],
                  "bytes": [None, None, b"\x01\x02"],
                  "transcript": ["same words", "same words", "other"]}
                 ).to_parquet(os.path.join(in_dir, "f0.parquet"), index=False)
    schema = T.StructType([T.StructField("clip_id", T.StringType()),
                           T.StructField("bytes", T.BinaryType()),
                           T.StructField("transcript", T.StringType())])
    stream = (spark.readStream.schema(schema).parquet(in_dir)
              .withColumn("ingest_ts", F.current_timestamp()))
    q = (exact_dedup_stream(stream)
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()
    assert sorted(got["clip_id"]) == ["x1", "x2", "y1"]


def test_pcm_allclose_snr_empty_vs_resample(spark):
    """Empty PCM + differing sample rates: the (bool, float) contract
    must hold (np.interp raised on the empty sample array before)."""
    import numpy as np
    from record_deduplication_spark.functions.audio import pcm_allclose_snr
    ok, s = pcm_allclose_snr(np.zeros(0, dtype=np.float64), 8000,
                             np.ones(16, dtype=np.float64) * 0.5, 16000)
    assert ok is False and s == float("-inf")
    ok2, s2 = pcm_allclose_snr(np.ones(16) * 0.5, 16000,
                               np.zeros(0), 8000)
    assert ok2 is False and s2 == float("-inf")


def test_clusters_sub_rebuilds_on_param_change(spark, tmp_path):
    """resume=True must not serve a clusters_sub table computed under a
    DIFFERENT max_cluster_size."""
    from record_deduplication_spark.datagen import generate_clips
    from record_deduplication_spark.plans.pipeline import DedupPipeline
    clips_pdf, _ = generate_clips(n_clips=120, seed=13)
    clips = spark.createDataFrame(clips_pdf)
    wd = str(tmp_path / "wd")
    r1 = DedupPipeline(spark, wd).run(clips, resume=False,
                                      max_cluster_size=500)
    sizes1 = (r1.subdivided.where(F.col("cluster_key").isNotNull())
              .groupBy("cluster_key").count()
              .agg(F.max("count")).collect()[0][0])
    r2 = DedupPipeline(spark, wd).run(clips, resume=True,
                                      max_cluster_size=2)
    sizes2 = (r2.subdivided.where(F.col("cluster_key").isNotNull())
              .groupBy("cluster_key").count().agg(F.max("count"))
              .collect()[0][0])
    assert sizes2 <= 2 or sizes2 < sizes1  # rebuilt under the new bound
    # same params -> served from store (marker matches)
    r3 = DedupPipeline(spark, wd).run(clips, resume=True,
                                      max_cluster_size=2)
    assert (r3.subdivided.toPandas().sort_values("clip_id")
            .reset_index(drop=True)
            .equals(r2.subdivided.toPandas().sort_values("clip_id")
                    .reset_index(drop=True)))


# ---------------------------------------------------------------------------
# third review batch: session/cli/config/oracle/bench-tooling seams
# ---------------------------------------------------------------------------

def test_session_no_shuffle_default_for_cluster_masters(monkeypatch):
    """A cluster master (spark://, yarn) must NOT have shuffle
    partitions derived from this driver machine's core count — only
    local masters get the derived default."""
    import inspect
    from record_deduplication_spark import session as S
    src = inspect.getsource(S.build_session)
    # pin the guard: the derivation branch requires a local master
    assert 'master.startswith("local")' in src
    # and a local master still derives as before
    captured = {}
    real_builder = S.SparkSession.builder

    class FakeBuilder:
        def appName(self, *_): return self
        def master(self, m): captured["master"] = m; return self
        def config(self, k, v=None):
            captured[k] = v
            return self
        def getOrCreate(self): raise RuntimeError("stop-here")
    monkeypatch.setattr(S.SparkSession, "builder", FakeBuilder())
    try:
        with pytest.raises(RuntimeError, match="stop-here"):
            S.build_session(master="spark://head:7077")
    finally:
        monkeypatch.setattr(S.SparkSession, "builder", real_builder)
    assert "spark.sql.shuffle.partitions" not in captured


def test_lsh_rows_raises_not_asserts():
    from record_deduplication_spark.config import DEFAULT_CONFIG
    import dataclasses
    bad = dataclasses.replace(DEFAULT_CONFIG, num_perm=60, lsh_bands=16)
    with pytest.raises(ValueError, match="divisible"):
        _ = bad.lsh_rows


def test_cli_rejects_indivisible_num_perm():
    from record_deduplication_spark.cli import parse_config_overrides
    with pytest.raises(SystemExit, match="divisible"):
        parse_config_overrides(["num_perm=60"])
    cfg = parse_config_overrides(["num_perm=32", "lsh_bands=8"])
    assert cfg.lsh_rows == 4


def test_oracle_cluster_pairs_float_noise_label():
    """Float-typed noise (-1.0 from a pandas/parquet dtype promotion)
    must be excluded like integer -1, not grouped into one giant
    pseudo-cluster."""
    from record_deduplication_spark.oracle import cluster_pairs
    df = pd.DataFrame({"clip_id": ["a", "b", "c", "d"],
                       "cluster_id": [3.0, 3.0, -1.0, -1.0]})
    assert cluster_pairs(df) == {("a", "b")}


def test_incremental_max_cluster_size(spark, tmp_path):
    """run_incremental(max_cluster_size=...) subdivides the folded
    clusters instead of silently ignoring the argument (the CLI passes
    it through)."""
    import pandas as pd
    from record_deduplication_spark.datagen import generate_clips
    from record_deduplication_spark.plans.pipeline import DedupPipeline
    base_pdf, _ = generate_clips(n_clips=120, seed=17)
    batch_pdf, _ = generate_clips(n_clips=30, seed=18)
    batch_pdf["clip_id"] = ["new_" + c for c in batch_pdf["clip_id"]]
    wd = str(tmp_path / "wd")
    pipe = DedupPipeline(spark, wd)
    pipe.run(spark.createDataFrame(base_pdf), resume=False)
    all_df = spark.createDataFrame(
        pd.concat([base_pdf, batch_pdf], ignore_index=True))
    res = pipe.run_incremental(spark.createDataFrame(batch_pdf), all_df,
                               max_cluster_size=2)
    assert res.subdivided is not None
    sizes = (res.subdivided.where(F.col("cluster_key").isNotNull())
             .groupBy("cluster_key").count().toPandas()["count"])
    assert len(sizes) == 0 or sizes.max() <= 2


def test_stream_big_fp_exact_with_null_in_batch(spark, tmp_path):
    """One NULL fp in a micro-batch must not corrupt the OTHER
    fingerprints: Arrow renders a nullable long column as float64,
    rounding |fp| > 2^53 so distinct simhash values collide (verified:
    two fps differing in bit 8 both became the same float and one was
    wrongly suppressed at hamming_k=0). Nulls are now routed around
    the stateful operator."""
    import os
    import pandas as pd
    from pyspark.sql import types as T
    from record_deduplication_spark.streaming.dedup_stream import (
        near_dup_suppress_stream)
    big1 = (1 << 62) + 1
    big2 = big1 + (1 << 8)  # differs in one low bit: Hamming 1 > k=0
    base = str(tmp_path / "s")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "o", "c"))
    os.makedirs(in_dir)
    pd.DataFrame({"clip_id": ["a", "b", "n"],
                  "block_key": ["A", "A", "A"],
                  "fp": pd.array([big1, big2, None], dtype="Int64")}
                 ).to_parquet(os.path.join(in_dir, "f0.parquet"), index=False)
    schema = T.StructType([T.StructField("clip_id", T.StringType()),
                           T.StructField("block_key", T.StringType()),
                           T.StructField("fp", T.LongType())])
    q = (near_dup_suppress_stream(
            spark.readStream.schema(schema).parquet(in_dir), hamming_k=0)
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    # collect(), not toPandas(): the NULL-fp passthrough row would make
    # pandas render the OUTPUT column as float64 too, rounding at
    # display time and masking whether the stored values are exact
    out = {r.clip_id: r for r in spark.read.parquet(out_dir).collect()}
    assert out["a"].fp == big1
    assert out["b"].fp == big2  # bit-exact, not float-rounded
    assert out["a"].novel and out["b"].novel
    assert out["n"].novel and out["n"].fp is None
