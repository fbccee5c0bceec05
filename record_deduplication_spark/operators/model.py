"""Pair-scoring model stage (M1-M5).

Reference analog: /root/reference/src/core/model_engine.py —
heuristic labeling (:54-124), LogisticRegression train (:126-142,
195-228), predict_proba scoring (:230-261), high-confidence filter
(:259) and probability quantiles (:402-409).

Spark-first shape (SURVEY.md §2.5):

- labeling is pure `F.when` masks + top/bottom-k unions — JVM-side;
- the labeled set is tiny by construction (class-balanced sample), so
  training runs on the driver: a ~40-line numpy IRLS logistic
  regression (the container ships no sklearn; the reference's
  LogisticRegression(max_iter=1000) on the same features converges to
  the same optimum — both maximize the same L2-regularized
  log-likelihood);
- scoring is a NATIVE column expression sigmoid(b0 + dot(b, x)) —
  coefficients are literals folded into whole-stage codegen, no UDF,
  no broadcast needed (M3);
- quantiles via percentile_approx (M5).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heuristic_labels(feats: DataFrame, pos_floor: float = 0.8,
                     neg_ceil: float = 0.2, fallback_n: int = 200,
                     feature_cols: tuple[str, ...] = ("jaccard",),
                     seed: int = 42) -> DataFrame:
    """M1: threshold masks -> {1, 0} labels, class-balanced.

    pos: any feature >= pos_floor; neg: all features <= neg_ceil;
    fallback to top/bottom-N by mean feature when a class is empty
    (reference /root/reference/src/core/model_engine.py:54-124) —
    each fallback draws only from rows NOT matching the other class's
    mask AND not already taken by the other fallback (when both masks
    are empty the two fallbacks would otherwise both draw from the
    same undifferentiated pool — e.g. all-identical features — and
    hand the trainer contradictory labels on identical rows), so no
    pair can carry both labels.
    Returns the labeled subset only, with a `label` column.
    Raises ValueError when no labelable pair exists (empty input).
    """
    mean_expr = sum((F.coalesce(F.col(c), F.lit(0.0)) for c in feature_cols),
                    F.lit(0.0)) / len(feature_cols)
    pos_mask = None
    neg_mask = None
    for c in feature_cols:
        cm = F.coalesce(F.col(c), F.lit(0.0))
        pos_mask = (cm >= pos_floor) if pos_mask is None else (pos_mask | (cm >= pos_floor))
        neg_mask = (cm <= neg_ceil) if neg_mask is None else (neg_mask & (cm <= neg_ceil))
    # materialize once: the emptiness probes, counts and the two
    # orderBy/limit passes below would otherwise each recompute the
    # upstream feature plan (up to 6x)
    feats = (feats.withColumn("_mean_sim", mean_expr)
             .withColumn("_rid", F.monotonically_increasing_id())
             .localCheckpoint(eager=True))

    pos = feats.where(pos_mask)
    neg = feats.where(neg_mask)
    if pos.isEmpty():
        pos = (feats.where(~neg_mask)
               .orderBy(F.col("_mean_sim").desc(), "_rid").limit(fallback_n)
               .localCheckpoint(eager=True))
    if neg.isEmpty():
        neg = (feats.where(~pos_mask)
               .join(pos.select("_rid"), "_rid", "left_anti")
               .orderBy(F.col("_mean_sim").asc(), "_rid").limit(fallback_n))
    # class balance to min(|pos|, |neg|), deterministic order
    n = min(pos.count(), neg.count())
    if n == 0:
        raise ValueError(
            "heuristic_labels: no labelable pairs (empty or degenerate "
            "feature input) — cannot train; widen thresholds or check "
            "the upstream feature stage")
    pos = pos.orderBy(F.col("_mean_sim").desc(), "_rid").limit(n) \
             .withColumn("label", F.lit(1))
    neg = neg.orderBy(F.col("_mean_sim").asc(), "_rid").limit(n) \
             .withColumn("label", F.lit(0))
    return pos.unionByName(neg).drop("_mean_sim", "_rid")


def train_logistic(labeled: DataFrame, feature_cols: list[str],
                   label_col: str = "label", l2: float = 1e-6,
                   max_iter: int = 100, tol: float = 1e-8) -> dict:
    """M2: driver-side IRLS (Newton) logistic regression.

    The labeled set is class-balanced and small (M1 caps it); collect
    it and solve. Returns {"intercept": b0, "coef": {col: b}}.
    """
    pdf = labeled.select(*feature_cols, label_col).fillna(0.0).toPandas()
    X = np.column_stack([np.ones(len(pdf))] +
                        [pdf[c].to_numpy(dtype=np.float64) for c in feature_cols])
    y = pdf[label_col].to_numpy(dtype=np.float64)
    beta = np.zeros(X.shape[1])
    reg = np.eye(X.shape[1]) * l2
    reg[0, 0] = 0.0  # don't penalize the intercept
    for _ in range(max_iter):
        p = 1.0 / (1.0 + np.exp(-X @ beta))
        w = np.clip(p * (1.0 - p), 1e-10, None)
        g = X.T @ (y - p) - reg @ beta
        h = (X.T * w) @ X + reg
        step = np.linalg.solve(h, g)
        beta += step
        if float(np.abs(step).max()) < tol:
            break
    return {"intercept": float(beta[0]),
            "coef": {c: float(b) for c, b in zip(feature_cols, beta[1:])}}


def score_expr(model: dict):
    """M3: scoring as a native column expression — sigmoid(b0 + dot(b,
    x)) with literal coefficients; stays inside whole-stage codegen
    (the reference calls predict_proba row-wise;
    /root/reference/src/core/model_engine.py:230-261)."""
    z = F.lit(model["intercept"])
    for c, b in model["coef"].items():
        z = z + F.lit(b) * F.coalesce(F.col(c), F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_pairs(feats: DataFrame, model: dict, prob_col: str = "prob") -> DataFrame:
    return feats.withColumn(prob_col, score_expr(model))


def high_confidence(scored: DataFrame, threshold: float = 0.9,
                    prob_col: str = "prob") -> DataFrame:
    """M4 (reference /root/reference/src/core/model_engine.py:259)."""
    return scored.filter(F.col(prob_col) >= threshold)


def prob_quantiles(scored: DataFrame, prob_col: str = "prob",
                   qs: tuple[float, ...] = (0.9, 0.95, 0.99)) -> dict:
    """M5: percentile_approx in one agg pass. Empty (or all-null)
    input returns an empty dict rather than iterating a NULL agg."""
    row = scored.agg(F.percentile_approx(prob_col, list(qs)).alias("q")).collect()[0]
    if row.q is None:
        return {}
    return {f"p{int(q * 100)}": float(v) for q, v in zip(qs, row.q)}


# --------------------------------------------------------------------------
# S5: model persistence (the reference joblib-dumps its sklearn model,
# /root/reference/src/core/model_engine.py:374-376; our model is a plain
# coefficient dict, so persistence is an exact JSON round-trip plus a
# tabular form the CheckpointStore can commit like any other stage)
# --------------------------------------------------------------------------

def save_model(model: dict, path: str) -> None:
    """Exact round-trip: floats serialized via repr-precision JSON."""
    import json
    with open(path, "w") as f:
        json.dump(model, f, sort_keys=True)


def load_model(path: str) -> dict:
    import json
    with open(path) as f:
        return json.load(f)


def model_to_rows(model: dict) -> list[tuple[str, float]]:
    """(term, value) rows; intercept under the reserved term name."""
    rows = [("__intercept__", float(model["intercept"]))]
    rows += sorted((c, float(b)) for c, b in model["coef"].items())
    return rows


def model_from_rows(rows) -> dict:
    d = {r[0]: float(r[1]) for r in (tuple(r) for r in rows)}
    intercept = d.pop("__intercept__")
    return {"intercept": intercept, "coef": d}
