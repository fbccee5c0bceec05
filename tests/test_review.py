"""G5 batch+parallel review fan-out (operators/review.py).

Mirrors the reference's semantics: batch chunking, per-batch failure
degradation to error rows (openai_deduplicator.py:349-360), retry,
and the summary block (:368-375).
"""

import os

import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.operators.review import (
    batch_review_fanout, review_summary, threshold_reviewer)


@pytest.fixture()
def pairs(spark):
    rows = [(f"a{i:02d}", f"b{i:02d}", i / 20.0,
             "Acme Corp" if i % 3 else "", f"acme{i}") for i in range(20)]
    return spark.createDataFrame(
        rows, "id_1 string, id_2 string, score double, "
              "company_1 string, company_2 string")


def test_threshold_reviewer_fanout(spark, pairs):
    v = batch_review_fanout(pairs, threshold_reviewer(0.5), batch_size=3)
    pdf = v.toPandas().sort_values("pair_id").reset_index(drop=True)
    assert len(pdf) == 20
    assert not pdf["error"].any()
    # merge verdict is the pure threshold rule
    assert pdf["same_organization"].tolist() == [i / 20.0 >= 0.5 for i in range(20)]
    # primary = smaller id; canonical = longer company
    assert (pdf["primary_record_id"] == pdf["pair_id"].str[:3]).all()
    assert pdf.loc[4, "canonical_name"] == "Acme Corp"  # longer name wins
    assert pdf.loc[0, "canonical_name"] == "acme0"  # company_1 empty


def test_failed_batch_degrades_to_error_rows(spark, pairs):
    def flaky(batch):
        if any(p["pair_id"].startswith("a0") for p in batch):
            raise RuntimeError("api down")
        return threshold_reviewer(0.5)(batch)

    # batch_size=1 so exactly the a00..a09 pairs fail
    v = batch_review_fanout(pairs, flaky, batch_size=1, max_retries=1)
    pdf = v.toPandas().sort_values("pair_id").reset_index(drop=True)
    assert len(pdf) == 20
    bad = pdf[pdf["error"]]
    assert set(bad["pair_id"].str[:3]) == {f"a0{i}" for i in range(10)}
    # reference's degradation shape: not merged, zero confidence,
    # primary = record_1, canonical = record_1's company
    assert (~bad["same_organization"]).all()
    assert (bad["confidence"] == 0.0).all()
    assert (bad["primary_record_id"] == bad["pair_id"].str[:3]).all()
    s = review_summary(v)
    assert s["total_pairs_analyzed"] == 20 and s["error_pairs"] == 10
    assert s["pairs_merged"] == sum(
        i / 20.0 >= 0.5 for i in range(10, 20))
    assert s["merge_rate"] == pytest.approx(s["pairs_merged"] / 20)


def test_retry_recovers_transient_failure(spark, pairs, tmp_path):
    marker = str(tmp_path / "attempts")

    def transient(batch):
        # fails on the first attempt per batch, succeeds on retry
        key = batch[0]["pair_id"]
        prev = (open(marker).read().splitlines()
                if os.path.exists(marker) else [])
        with open(marker, "a") as f:
            f.write(key + "\n")
        if key not in prev:
            raise RuntimeError("transient")
        return threshold_reviewer(0.5)(batch)

    one = pairs.coalesce(1)
    v = batch_review_fanout(one, transient, batch_size=20, max_retries=2,
                            max_workers_per_partition=1)
    pdf = v.toPandas()
    assert len(pdf) == 20 and not pdf["error"].any()


def test_wrong_length_reviewer_is_a_batch_failure(spark, pairs):
    v = batch_review_fanout(pairs, lambda b: [], batch_size=5,
                            max_retries=0)
    assert v.where(F.col("error")).count() == 20


def test_missing_attr_columns_default_empty(spark):
    df = spark.createDataFrame([("x", "y", 0.99)],
                               "id_1 string, id_2 string, score double")
    pdf = batch_review_fanout(df, threshold_reviewer(), batch_size=1).toPandas()
    assert pdf.loc[0, "canonical_name"] == ""
    assert pdf.loc[0, "same_organization"]
