"""Tests for train/eval n-gram decontamination (training-data extra)."""

import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.analysis.decontaminate import (
    contamination_report, decontaminate, ngram_hash_profile)


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "sphinx of black quartz judge my vow today ok")],
        ["doc_id", "text"])
    eval_df = spark.createDataFrame(
        # 10: fully contaminated (verbatim train doc 1)
        [(10, "the quick brown fox jumps over the lazy dog"),
         # 11: partially contaminated (one 4-gram from doc 2 inside clean text)
         (11, "totally novel words pack my box with clean unrelated tail here"),
         # 12: clean
         (12, "completely different sentence sharing no grams with anything"),
         # 13: too short to have any 4-gram
         (13, "tiny doc"),
         # 14: null text
         (14, None)],
        ["doc_id", "text"])
    return train, eval_df


def test_profile_counts_and_short_docs(spark, corpora):
    _, eval_df = corpora
    prof = ngram_hash_profile(eval_df, n=4).toPandas()
    # doc 10: 9 tokens -> 6 grams; doc 13 (<4 tokens) and 14 (null) absent
    by_doc = prof.groupby("doc_id").size()
    assert by_doc[10] == 6
    assert 13 not in by_doc.index and 14 not in by_doc.index


def test_contamination_report(spark, corpora):
    train, eval_df = corpora
    rep = (contamination_report(train, eval_df, n=4)
           .orderBy("doc_id").toPandas().set_index("doc_id"))
    assert rep.loc[10, "contamination_ratio"] == 1.0
    assert 0.0 < rep.loc[11, "contamination_ratio"] < 1.0
    assert rep.loc[12, "contamination_ratio"] == 0.0
    # doc 11: exactly the grams fully inside "pack my box with" = 1 4-gram,
    # but 'my box with five...' not present; surrounding novel words keep
    # the rest clean
    assert rep.loc[11, "n_contaminated"] == 1
    assert 13 not in rep.index  # too short: nothing to leak


def test_decontaminate_strict_and_thresholded(spark, corpora):
    train, eval_df = corpora
    kept_strict = sorted(r.doc_id for r in
                         decontaminate(train, eval_df, n=4).collect())
    # strict: any shared gram drops the doc; short/null docs pass through
    assert kept_strict == [12, 13, 14]
    kept_loose = sorted(r.doc_id for r in
                        decontaminate(train, eval_df, n=4, max_ratio=0.5).collect())
    # doc 11 is only lightly contaminated -> kept at 50% tolerance
    assert kept_loose == [11, 12, 13, 14]


def test_profile_is_distinct_per_doc(spark):
    df = spark.createDataFrame([(1, "a b a b a b a b")], ["doc_id", "text"])
    prof = ngram_hash_profile(df, n=2).toPandas()
    # grams 'a b' and 'b a' repeat; profile must stay distinct
    assert len(prof) == 2


def test_contamination_report_plan_shape(spark):
    """Pin the scale claims from the module docstring to the physical
    plan: both parquet scans are column-pruned to (doc_id, text) with
    IsNotNull pushed, gram hashing happens BEFORE any exchange, and
    every exchange key is the 8-byte hash or the doc id — never text."""
    from record_deduplication_spark.analysis.decontaminate import (
        contamination_report)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = contamination_report(docs.where("doc_id % 10 <> 0"),
                               docs.where("doc_id % 10 = 0"), n=5)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2
    for s in scans:
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in s, s
        assert "IsNotNull(text)" in s, s
    # no exchange partitions by text; only hash/id keys appear
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "text" not in l, l
            assert ("gram_hash" in l) or ("doc_id" in l), l
