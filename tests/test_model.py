"""M1-M5 model stage: heuristic labels, driver IRLS logistic
regression, native-expression scoring, threshold filter, quantiles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.operators.model import (
    heuristic_labels, high_confidence, prob_quantiles, score_expr,
    score_pairs, train_logistic)


@pytest.fixture(scope="module")
def feats(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        dup = i % 2 == 0
        jac = float(np.clip(rng.normal(0.9 if dup else 0.08, 0.05), 0, 1))
        ham = float(np.clip(rng.normal(0.95 if dup else 0.1, 0.05), 0, 1))
        rows.append((f"a{i}", f"b{i}", jac, ham, dup))
    return spark.createDataFrame(
        rows, "id_1 string, id_2 string, jaccard double, fp_sim double, truth boolean")


def test_heuristic_labels_balanced_and_correct(feats):
    lab = heuristic_labels(feats, feature_cols=("jaccard", "fp_sim"))
    pdf = lab.toPandas()
    assert set(pdf["label"]) == {0, 1}
    assert (pdf["label"] == 1).sum() == (pdf["label"] == 0).sum()  # balanced
    # threshold masks recover the planted classes
    assert (pdf.loc[pdf.label == 1, "truth"]).all()
    assert (~pdf.loc[pdf.label == 0, "truth"]).all()


def test_train_and_score_separates_classes(feats):
    lab = heuristic_labels(feats, feature_cols=("jaccard", "fp_sim"))
    model = train_logistic(lab, ["jaccard", "fp_sim"])
    scored = score_pairs(feats, model)
    pdf = scored.toPandas()
    acc = ((pdf["prob"] >= 0.5) == pdf["truth"]).mean()
    assert acc >= 0.99
    assert model["coef"]["jaccard"] > 0 and model["coef"]["fp_sim"] > 0


def test_score_expr_matches_driver_sigmoid(spark):
    model = {"intercept": -1.5, "coef": {"x": 2.0, "y": -0.5}}
    df = spark.createDataFrame([(0.3, 0.9), (0.0, 0.0), (1.0, 1.0)], "x double, y double")
    got = [r.p for r in df.select(score_expr(model).alias("p")).collect()]
    want = [1 / (1 + math.exp(-(-1.5 + 2.0 * x - 0.5 * y)))
            for x, y in [(0.3, 0.9), (0.0, 0.0), (1.0, 1.0)]]
    assert got == pytest.approx(want, rel=1e-12)


def test_score_plan_is_native_no_udf(feats):
    model = {"intercept": 0.0, "coef": {"jaccard": 1.0, "fp_sim": 1.0}}
    plan = score_pairs(feats, model)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # "*(n)" prefixes mark WholeStageCodegen stages in the compact form
    assert "*(1) Project" in plan


def test_high_confidence_and_quantiles(feats):
    lab = heuristic_labels(feats, feature_cols=("jaccard", "fp_sim"))
    model = train_logistic(lab, ["jaccard", "fp_sim"])
    scored = score_pairs(feats, model)
    hi = high_confidence(scored, 0.9)
    assert 0 < hi.count() <= feats.count()
    q = prob_quantiles(scored)
    assert q["p90"] >= q["p95"] * 0 and 0.0 <= q["p90"] <= 1.0
    assert q["p90"] <= q["p95"] <= q["p99"]


def test_fallback_labels_when_no_threshold_hits(spark):
    df = spark.createDataFrame(
        [(f"x{i}", f"y{i}", 0.5 + (i % 10) / 100.0) for i in range(50)],
        "id_1 string, id_2 string, jaccard double")
    lab = heuristic_labels(df, fallback_n=5)
    pdf = lab.toPandas()
    assert (pdf["label"] == 1).sum() == 5 and (pdf["label"] == 0).sum() == 5


def test_heuristic_labels_degenerate_features_no_contradiction(spark):
    """All-identical mid-band features fire BOTH fallbacks; the same
    pair must not be labeled 1 and 0 simultaneously."""
    from record_deduplication_spark.operators.model import heuristic_labels
    feats = spark.createDataFrame(
        [(f"a{i}", f"b{i}", 0.5) for i in range(100)],
        "id_1 string, id_2 string, jaccard double")
    lab = heuristic_labels(feats, fallback_n=30).toPandas()
    per_pair = lab.groupby(["id_1", "id_2"])["label"].nunique()
    assert (per_pair == 1).all(), "pair carries contradictory labels"
    assert set(lab["label"]) == {0, 1}


def test_prob_quantiles_empty(spark):
    from record_deduplication_spark.operators.model import prob_quantiles
    empty = spark.createDataFrame([], "prob double")
    assert prob_quantiles(empty) == {}
