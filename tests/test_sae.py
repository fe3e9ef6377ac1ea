"""Fay–Herriot small-area estimation (``estimators/sae``).

Oracle strategy: an independent numpy replica of the Prasad–Rao
pipeline (matrix algebra, no shared code with the Spark kernel) must
agree to 1e-9; structural properties (convexity of the EBLUP, shrinkage
ordering in psi, the sigma2=0 truncation collapse) pin the semantics.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.estimators.sae import SAEError, fay_herriot


def _np_fh(y, psi, X):
    """Independent numpy Fay–Herriot replica (Rao & Molina 2015 ch. 6)."""
    m, p = X.shape
    xtx_inv = np.linalg.inv(X.T @ X)
    b_ols = xtx_inv @ (X.T @ y)
    resid = y - X @ b_ols
    tr_h = float(np.trace(xtx_inv @ (X.T @ (psi[:, None] * X))))
    s2 = max(0.0, (float(resid @ resid) - (psi.sum() - tr_h)) / (m - p))
    a = 1.0 / (s2 + psi)
    A = X.T @ (a[:, None] * X)
    A_inv = np.linalg.inv(A)
    b_wls = A_inv @ (X.T @ (a * y))
    gamma = s2 / (s2 + psi)
    synth = X @ b_wls
    eblup = gamma * y + (1 - gamma) * synth
    vbar = 2.0 / m**2 * ((s2 + psi) ** 2).sum()
    g1 = gamma * psi
    g2 = (1 - gamma) ** 2 * np.einsum("di,ij,dj->d", X, A_inv, X)
    g3 = psi**2 / (s2 + psi) ** 3 * vbar
    return s2, b_wls, gamma, eblup, g1 + g2 + 2 * g3


def _areas(spark, m=30):
    """Deterministic area table with real area effects: y = 10 + 2x + v
    with v a +-oscillation and heteroscedastic known psi."""
    rows = []
    for d in range(m):
        x = (d % 7) / 7.0
        v = 0.8 * (1 if d % 2 == 0 else -1) * (1 + (d % 5) / 5.0)
        e = 0.3 * (1 if d % 3 == 0 else -1)
        psi = 0.2 + (d % 4) * 0.3
        rows.append((d, 10.0 + 2.0 * x + v + e, psi, x))
    return rows, spark.createDataFrame(rows, ["area", "y", "psi", "x"])


class TestAgainstNumpy:
    def test_matches_numpy_replica(self, spark):
        rows, df = _areas(spark)
        out = {r["area"]: r for r in fay_herriot(df, "y", "psi", ["x"]).collect()}
        y = np.array([r[1] for r in rows])
        psi = np.array([r[2] for r in rows])
        X = np.column_stack([np.ones(len(rows)), [r[3] for r in rows]])
        s2, b_wls, gamma, eblup, mse = _np_fh(y, psi, X)
        assert out[0]["sigma2_v"] == pytest.approx(s2, rel=1e-9)
        for d in range(len(rows)):
            assert out[d]["gamma"] == pytest.approx(gamma[d], rel=1e-9)
            assert out[d]["eblup"] == pytest.approx(eblup[d], rel=1e-9)
            assert out[d]["mse"] == pytest.approx(mse[d], rel=1e-9)

    def test_two_covariates(self, spark):
        rows, df = _areas(spark)
        df = df.withColumn("x2", (F.col("area") % 3).cast("double"))
        out = {r["area"]: r for r in fay_herriot(df, "y", "psi", ["x", "x2"]).collect()}
        y = np.array([r[1] for r in rows])
        psi = np.array([r[2] for r in rows])
        X = np.column_stack(
            [np.ones(len(rows)), [r[3] for r in rows], [r[0] % 3 for r in rows]]
        )
        s2, b_wls, gamma, eblup, mse = _np_fh(y, psi, X)
        for d in range(len(rows)):
            assert out[d]["eblup"] == pytest.approx(eblup[d], rel=1e-9)
            assert out[d]["mse"] == pytest.approx(mse[d], rel=1e-9)


class TestStructure:
    def test_eblup_is_convex_combination(self, spark):
        _, df = _areas(spark)
        for r in fay_herriot(df, "y", "psi", ["x"]).collect():
            lo, hi = sorted((r["direct"], r["synthetic"]))
            assert lo - 1e-9 <= r["eblup"] <= hi + 1e-9
            assert 0.0 <= r["gamma"] <= 1.0

    def test_larger_psi_shrinks_more(self, spark):
        _, df = _areas(spark)
        rows = fay_herriot(df, "y", "psi", ["x"]).collect()
        by_psi = sorted(rows, key=lambda r: r["psi"])
        gammas = [r["gamma"] for r in by_psi]
        assert all(a >= b - 1e-12 for a, b in zip(gammas, gammas[1:]))

    def test_no_area_effect_truncates_to_synthetic(self, spark):
        # y exactly linear in x and psi large -> PR moment < 0 -> s2 = 0,
        # gamma = 0, eblup = synthetic for every area
        rows = [(d, 5.0 + 3.0 * (d % 7), 2.0, float(d % 7)) for d in range(20)]
        df = spark.createDataFrame(rows, ["area", "y", "psi", "x"])
        out = fay_herriot(df, "y", "psi", ["x"]).collect()
        for r in out:
            assert r["sigma2_v"] == 0.0
            assert r["gamma"] == 0.0
            assert r["eblup"] == pytest.approx(r["synthetic"], rel=1e-12)

    def test_keep_cols_survive(self, spark):
        _, df = _areas(spark)
        df = df.withColumn("label", F.concat(F.lit("area-"), F.col("area")))
        out = fay_herriot(df, "y", "psi", ["x"], keep_cols=["area", "label"])
        assert {"area", "label"} <= set(out.columns)
        assert out.count() == 30


class TestGuards:
    def test_too_few_areas(self, spark):
        df = spark.createDataFrame(
            [(0, 1.0, 0.5, 0.1), (1, 2.0, 0.5, 0.2)], ["area", "y", "psi", "x"]
        )
        with pytest.raises(SAEError, match="more areas than regressors"):
            fay_herriot(df, "y", "psi", ["x"])

    def test_nonpositive_psi(self, spark):
        _, df = _areas(spark)
        bad = df.withColumn(
            "psi", F.when(F.col("area") == 3, 0.0).otherwise(F.col("psi"))
        )
        with pytest.raises(SAEError, match="non-positive sampling"):
            fay_herriot(bad, "y", "psi", ["x"])

    def test_missing_column(self, spark):
        _, df = _areas(spark)
        with pytest.raises(SAEError, match="not found"):
            fay_herriot(df, "nope", "psi", ["x"])

    def test_collinear_design(self, spark):
        _, df = _areas(spark)
        df = df.withColumn("x_dup", F.col("x"))
        with pytest.raises(SAEError, match="singular design"):
            fay_herriot(df, "y", "psi", ["x", "x_dup"])

    def test_null_direct_estimate_rejected(self, spark):
        _, df = _areas(spark)
        bad = df.withColumn(
            "y", F.when(F.col("area") == 3, None).otherwise(F.col("y"))
        )
        with pytest.raises(SAEError, match="null direct estimate"):
            fay_herriot(bad, "y", "psi", ["x"])

    def test_null_covariate_rejected(self, spark):
        _, df = _areas(spark)
        bad = df.withColumn(
            "x", F.when(F.col("area") == 5, None).otherwise(F.col("x"))
        )
        with pytest.raises(SAEError, match="null"):
            fay_herriot(bad, "y", "psi", ["x"])
