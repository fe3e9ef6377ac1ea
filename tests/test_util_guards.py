"""Guard-path tests for the round-2 hardening: error_context annotation,
IRLS convergence flag, OLS aliased-column pivoting, and the adaptive
fan-out repartition."""

import warnings

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.linalg import fit_logistic, fit_ols
from data_integration_est_spark.util import error_context, spread


def test_error_context_preserves_exception_type():
    """The old type(e)(msg) re-raise broke on multi-arg constructors; the
    annotate-and-reraise path must keep the original type and args."""
    class Weird(Exception):
        def __init__(self, a, b):
            super().__init__(a, b)

    with pytest.raises(Weird) as exc_info:
        with error_context("while doing the thing"):
            raise Weird(1, 2)
    assert exc_info.value.args == (1, 2)
    assert "while doing the thing" in getattr(exc_info.value, "__notes__", [""])[0]


def test_fit_logistic_converged_flag(spark):
    rows = [(float(i % 7) / 7.0, 1 if i % 3 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y int")
    fit = fit_logistic(df, "y", ["x"])
    assert fit.converged is True
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bad = fit_logistic(df, "y", ["x"], max_iter=1)
    assert bad.converged is False
    assert any("did not converge" in str(w.message) for w in caught)


def test_fit_ols_aliased_columns_match_r_lm(spark):
    """x1 + x2 = 1 aliases the intercept: the later column gets a zero
    coefficient (R's NA) and predictions equal the reduced model's."""
    rows = [(1.0 if i % 2 == 0 else 0.0, float(i % 5), i) for i in range(100)]
    df = spark.createDataFrame(rows, "x1 double, y double, i long").withColumn(
        "x2", 1.0 - F.col("x1")
    )
    full = fit_ols(df, "y", ["x1", "x2"], intercept=True)
    reduced = fit_ols(df, "y", ["x1"], intercept=True)
    b = full.coef_for(())
    assert b[2] == 0.0  # x2 aliased -> dropped
    rb = reduced.coef_for(())
    assert abs(b[0] - rb[0]) < 1e-9 and abs(b[1] - rb[1]) < 1e-9


def test_fit_ols_insufficient_rows_raises(spark):
    from data_integration_est_spark.kernels.linalg import CalibrationError

    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(CalibrationError, match="insufficient rows"):
        fit_ols(df, "y", ["x"], intercept=True)


def test_spread_noop_when_parallel_enough(spark):
    wide = spark.range(0, 1000).repartition(64)
    assert spread(wide).rdd.getNumPartitions() == 64  # untouched
    narrow = spark.range(0, 1000).coalesce(1)
    assert spread(narrow).rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
