"""C3 Yeo-Johnson scaling (kernel + DataFrame op) and M6 id coercion."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_deduplication_spark.functions.scaling import (fit_lambda,
                                                          yeo_johnson)
from record_deduplication_spark.operators.stats import (yeo_johnson as
                                                        yj_op,
                                                        yeo_johnson_col)


def test_kernel_identities():
    x = np.array([-3.0, -1.5, 0.0, 0.5, 2.0, 10.0])
    # lam=1 is the identity
    assert np.allclose(yeo_johnson(x, 1.0), x)
    # psi(0) = 0 for any lam
    for lam in (-1.0, 0.0, 0.5, 1.0, 2.0, 3.0):
        assert yeo_johnson(np.array([0.0]), lam)[0] == 0.0
    # continuity at the lam=0 and lam=2 branch points
    assert np.allclose(yeo_johnson(x, 1e-10), yeo_johnson(x, 0.0), atol=1e-6)
    assert np.allclose(yeo_johnson(x, 2.0 - 1e-10), yeo_johnson(x, 2.0),
                       atol=1e-6)
    # monotone increasing
    assert np.all(np.diff(yeo_johnson(np.sort(x), 0.7)) > 0)


def test_kernel_known_values():
    # hand-computed: lam=0.5, x=3 -> ((4)^0.5 - 1)/0.5 = 2
    assert yeo_johnson(np.array([3.0]), 0.5)[0] == pytest.approx(2.0)
    # lam=0, x=e-1 -> log(e) = 1
    assert yeo_johnson(np.array([np.e - 1.0]), 0.0)[0] == pytest.approx(1.0)
    # lam=2, x=-(e-1) -> -log(e) = -1
    assert yeo_johnson(np.array([-(np.e - 1.0)]), 2.0)[0] == pytest.approx(-1.0)
    # lam=3, x=-1 -> -((2)^(-1) - 1)/(-1) = -0.5
    assert yeo_johnson(np.array([-1.0]), 3.0)[0] == pytest.approx(-0.5)


def test_fit_lambda_recovers_distribution_shape():
    rng = np.random.default_rng(7)
    z = rng.normal(size=4000)
    # already-normal data: lam ~ 1
    assert fit_lambda(z) == pytest.approx(1.0, abs=0.15)
    # for x >= 0, yeo-johnson(x, 0) = log1p(x); expm1 of a positive
    # normal is therefore exactly log-normalized by lam = 0
    assert fit_lambda(np.expm1(z * 0.5 + 2.0)) == pytest.approx(0.0, abs=0.15)
    # constant column: identity by convention
    assert fit_lambda(np.full(100, 3.25)) == 1.0
    with pytest.raises(ValueError):
        fit_lambda(np.array([]))


def test_fit_is_the_likelihood_max():
    from record_deduplication_spark.functions.scaling import _loglik
    rng = np.random.default_rng(11)
    x = np.expm1(rng.normal(size=2000) * 0.4) + rng.normal(size=2000) * 0.1
    lam = fit_lambda(x)
    assert _loglik(x, lam) >= _loglik(x, lam + 0.05) - 1e-9
    assert _loglik(x, lam) >= _loglik(x, lam - 0.05) - 1e-9


def test_dataframe_op_matches_kernel_and_standardizes(spark):
    rng = np.random.default_rng(3)
    vals = np.round(np.expm1(rng.normal(size=500) * 0.6), 6)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out, lams = yj_op(df, ["x"], standardize=False)
    got = np.sort(np.array([r.x for r in out.collect()]))
    want = np.sort(yeo_johnson(vals, lams["x"]))
    assert np.allclose(got, want, atol=1e-9)

    std, _ = yj_op(df, ["x"], standardize=True)
    arr = np.array([r.x for r in std.collect()])
    assert arr.mean() == pytest.approx(0.0, abs=1e-9)
    assert arr.std() == pytest.approx(1.0, abs=1e-6)


def test_dataframe_op_is_native_expression(spark):
    df = spark.range(100).select((F.col("id") - 50).cast("double").alias("x"))
    expr_df = df.select(yeo_johnson_col("x", 0.5).alias("y"))
    plan = expr_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_coerce_digit_id(spark):
    from record_deduplication_spark.functions.columns import coerce_digit_id
    df = spark.createDataFrame(
        [("rec_00123",), ("456",), ("no-digits",), (None,)], "raw string")
    got = [r.id for r in
           df.select(coerce_digit_id("raw").alias("id")).collect()]
    assert got == [123, 456, None, None]
