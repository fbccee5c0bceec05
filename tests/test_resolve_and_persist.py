"""P5 column auto-detection + S5 model persist/load + CLI coercion +
checkpoint remote-workdir fail-fast."""

import os

import pytest

from record_deduplication_spark.functions.columns import resolve_columns
from record_deduplication_spark.operators.model import (
    load_model, model_from_rows, model_to_rows, save_model)


# ---------------------------------------------------------------- P5

def test_resolve_columns_reference_sample():
    """The reference's own sample_input.csv header
    (/root/reference/data/sample_input.csv)."""
    got = resolve_columns(["record_id", "company", "domain", "phone", "address"])
    assert got == {"company": "company", "domain": "domain",
                   "phone": "phone", "address": ["address"],
                   "id": "record_id"}


def test_resolve_columns_fuzzy_cases():
    """Detection-order goldens from preprocess_engine.py:234-285:
    exact beats containment; CRM-style names resolve."""
    cols = ["Sys ID", "Company Name", "Website", "Phone Number",
            "Street Address", "City", "Postal Code", "Notes"]
    got = resolve_columns(cols)
    assert got["id"] == "Sys ID"                 # exact "sys id" match
    assert got["company"] == "Company Name"      # containment
    assert got["domain"] == "Website"            # exact list member
    assert got["phone"] == "Phone Number"
    assert got["address"] == ["Street Address", "City", "Postal Code"]

    # domain is exact-only: "Website URL" does NOT resolve
    assert resolve_columns(["Website URL"])["domain"] is None
    # company substring fallback
    assert resolve_columns(["the_org_title"])["company"] == "the_org_title"
    # id containment fallback when no exact name
    assert resolve_columns(["customer_key", "x"])["id"] == "customer_key"
    # graceful degradation
    empty = resolve_columns(["a", "b"])
    assert empty["company"] is None and empty["address"] == []


# ---------------------------------------------------------------- S5

def test_model_json_roundtrip(tmp_path):
    model = {"intercept": -3.141592653589793,
             "coef": {"jaccard": 7.000000001, "common_run": -0.25}}
    p = os.path.join(tmp_path, "model.json")
    save_model(model, p)
    assert load_model(p) == model  # exact float round-trip


def test_model_rows_roundtrip():
    model = {"intercept": 0.5, "coef": {"b": 1.25, "a": -2.0}}
    assert model_from_rows(model_to_rows(model)) == model


def test_model_stage_resume_skips_training(spark, tmp_path):
    """Kill/relaunch contract through the model stage: a second run
    with resume=True loads the committed coefficients instead of
    retraining (proved by feeding it different data)."""
    from record_deduplication_spark.plans.pipeline import DedupPipeline
    wd = os.path.join(tmp_path, "work")

    def feats(hi, lo, n=30):
        rows = ([(f"p{i}", f"q{i}", hi) for i in range(n)]
                + [(f"r{i}", f"s{i}", lo) for i in range(n)])
        return spark.createDataFrame(rows, "id_1 string, id_2 string, jaccard double")

    pipe = DedupPipeline(spark, wd)
    m1 = pipe.model_stage(feats(0.95, 0.05), resume=True)
    assert m1["coef"]["jaccard"] > 0
    # fresh pipeline object (relaunch), different data: must NOT retrain
    m2 = DedupPipeline(spark, wd).model_stage(feats(0.9, 0.1), resume=True)
    assert m2 == m1
    # resume=False retrains on the new data -> different coefficients
    m3 = DedupPipeline(spark, wd).model_stage(feats(0.9, 0.1), resume=False)
    assert m3 != m1 and m3["coef"]["jaccard"] > 0
    # and the stage is in the metrics log
    stages = set(r.stage for r in pipe.store.metrics().collect())
    assert "model" in stages


# --------------------------------------------------- CLI coercion

def test_parse_config_overrides_typing():
    from record_deduplication_spark.cli import parse_config_overrides
    cfg = parse_config_overrides(["num_perm=128", "jaccard_threshold=0.7"])
    assert cfg.num_perm == 128 and cfg.jaccard_threshold == 0.7
    with pytest.raises(SystemExit):  # no silent truncation
        parse_config_overrides(["num_perm=63.7"])
    with pytest.raises(SystemExit):
        parse_config_overrides(["nope=1"])
    with pytest.raises(SystemExit):
        parse_config_overrides(["num_perm"])


# ------------------------------------- checkpoint remote fail-fast

def test_checkpoint_rejects_remote_uri_without_iceberg(spark):
    from record_deduplication_spark.sources.checkpoint import CheckpointStore
    with pytest.raises(ValueError, match="Iceberg"):
        CheckpointStore(spark, "s3://bucket/work")


def test_hash_split_deterministic_disjoint_proportional(spark):
    """hash_split: stable across runs/partitionings, every row gets
    exactly one split, proportions near the weights."""
    import pytest
    from pyspark.sql import functions as F

    from record_deduplication_spark.functions.columns import hash_split

    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id").groupBy("split").count().toPandas()
    got = dict(zip(a["split"], a["count"]))
    assert set(got) == {"train", "valid", "test"}
    assert abs(got["train"] / 20_000 - 0.8) < 0.02
    assert abs(got["valid"] / 20_000 - 0.1) < 0.01
    # repartitioning must not move any row between splits
    b = hash_split(df.repartition(17), "doc_id")
    joined = (hash_split(df, "doc_id").alias("x")
              .join(b.alias("y"), "doc_id")
              .where(F.col("x.split") != F.col("y.split")))
    assert joined.count() == 0
    # a different seed reshuffles assignments
    c = hash_split(df, "doc_id", seed=1).withColumnRenamed("split", "s2")
    moved = hash_split(df, "doc_id").join(c, "doc_id").where("split <> s2")
    assert moved.count() > 0
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", weights={"train": 0.5})
