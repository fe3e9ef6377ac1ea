"""Design-based regression (``estimators/glm.svyglm``) vs an independent
numpy sandwich-variance oracle, for both model types."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.estimators.glm import svyglm


def _sandwich(X, y, w, beta, kind):
    eta = X @ beta
    if kind == "normal":
        resid = y - eta
        A = (X * (w)[:, None]).T @ X
    else:
        p = 1 / (1 + np.exp(-eta))
        resid = y - p
        A = (X * (w * p * (1 - p))[:, None]).T @ X
    S = X * (w * resid)[:, None]
    M = S.T @ S / 1.0  # sum of w^2 e^2 x x' since S rows are w e x
    n = len(y)
    Ainv = np.linalg.inv(A)
    V = n / (n - 1.0) * Ainv @ M @ Ainv
    return np.sqrt(np.diag(V))


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(3)
    n = 4000
    x = rng.normal(1.0, 2.0, n)
    w = rng.integers(1, 6, n).astype(float)
    y = 2.0 + 0.7 * x + rng.normal(0, 1.5, n)
    yb = (rng.uniform(size=n) < 1 / (1 + np.exp(-(0.4 + 0.9 * x)))).astype(float)
    pdf = pd.DataFrame({"x": x, "w": w, "y": y, "yb": yb})
    return spark.createDataFrame(pdf), pdf


def test_svyglm_linear_matches_numpy(data):
    df, pdf = data
    des = SurveyDesign(df=df, weight_col="w")
    out = {r["term"]: (r["coef"], r["se"]) for r in svyglm(des, "y ~ x").collect()}
    X = np.column_stack([np.ones(len(pdf)), pdf.x])
    W = np.diag(pdf.w)
    beta = np.linalg.solve(X.T @ W @ X, X.T @ (pdf.w * pdf.y))
    se = _sandwich(X, pdf.y.to_numpy(), pdf.w.to_numpy(), beta, "normal")
    assert out["(Intercept)"][0] == pytest.approx(beta[0], abs=1e-6)
    assert out["x"][0] == pytest.approx(beta[1], abs=1e-6)
    assert out["(Intercept)"][1] == pytest.approx(se[0], abs=1e-6)
    assert out["x"][1] == pytest.approx(se[1], abs=1e-6)


def test_svyglm_logistic_matches_numpy(data):
    df, pdf = data
    des = SurveyDesign(df=df, weight_col="w")
    out = {r["term"]: (r["coef"], r["se"])
           for r in svyglm(des, "yb ~ x", model_type="logistic").collect()}
    # independent weighted IRLS
    X = np.column_stack([np.ones(len(pdf)), pdf.x])
    y, w = pdf.yb.to_numpy(), pdf.w.to_numpy()
    beta = np.zeros(2)
    for _ in range(60):
        p = 1 / (1 + np.exp(-(X @ beta)))
        Wd = w * p * (1 - p)
        step = np.linalg.solve((X * Wd[:, None]).T @ X, X.T @ (w * (y - p)))
        beta = beta + step
        if np.abs(step).max() < 1e-12:
            break
    se = _sandwich(X, y, w, beta, "logistic")
    assert out["(Intercept)"][0] == pytest.approx(beta[0], abs=1e-6)
    assert out["x"][0] == pytest.approx(beta[1], abs=1e-6)
    assert out["(Intercept)"][1] == pytest.approx(se[0], rel=1e-5)
    assert out["x"][1] == pytest.approx(se[1], rel=1e-5)


def test_svyglm_bad_model_type(data):
    df, _ = data
    with pytest.raises(ValueError, match="model_type"):
        svyglm(SurveyDesign(df=df, weight_col="w"), "y ~ x", model_type="probit")


def test_svyglm_grouped_matches_per_group_runs(spark):
    """r6: grouped svyglm (one stacked fit + one grouped score pass)
    must equal independent per-group runs, incl. the degenerate-group
    NULL convention."""
    import numpy as np

    rows = []
    rng = np.random.default_rng(5)
    for g in ("a", "b"):
        for i in range(200):
            x = rng.normal(2, 1)
            yv = (1.0 if g == "a" else -2.0) + 0.5 * x + rng.normal(0, 0.3)
            rows.append((g, float(x), float(yv), 1.0 + i % 4))
    rows.append(("tiny", 1.0, 1.0, 1.0))   # 1 row < 2 design cols
    df = spark.createDataFrame(rows, "g string, x double, y double, w double")
    des = SurveyDesign(df=df, weight_col="w")
    got = svyglm(des, "y ~ x", group_cols=["g"]).collect()
    by = {(r["g"], r["term"]): (r["coef"], r["se"]) for r in got}
    for g in ("a", "b"):
        single = svyglm(
            SurveyDesign(df=df.filter(F.col("g") == g), weight_col="w"),
            "y ~ x",
        ).collect()
        for r in single:
            assert by[(g, r["term"])] == (r["coef"], r["se"]), (g, r["term"])
    assert by[("tiny", "x")] == (None, None)


def test_svyglm_poisson_matches_numpy_irls(spark):
    """r6: family=poisson — coefficients equal an independent numpy IRLS
    (log link), score equations vanish, sandwich SE matches the numpy
    A^-1 M A^-1 assembly."""
    rng = np.random.default_rng(21)
    n = 3000
    x = rng.normal(0, 0.5, n)
    mu = np.exp(0.4 + 0.8 * x)
    y = rng.poisson(mu).astype(float)
    w = 1.0 + (np.arange(n) % 3).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, w)],
        "x double, y double, w double",
    )
    des = SurveyDesign(df=df, weight_col="w")
    got = {r["term"]: (r["coef"], r["se"])
           for r in svyglm(des, "y ~ x", model_type="poisson").collect()}

    X = np.column_stack([np.ones(n), x])
    beta = np.zeros(2)
    for _ in range(50):
        m = np.exp(X @ beta)
        H = (X * (w * m)[:, None]).T @ X
        s = X.T @ (w * (y - m))
        step = np.linalg.solve(H, s)
        beta = beta + step
        if np.max(np.abs(step)) < 1e-12:
            break
    m = np.exp(X @ beta)
    assert np.max(np.abs(X.T @ (w * (y - m)))) < 1e-6   # score == 0
    A = (X * (w * m)[:, None]).T @ X
    M = (X * ((w * (y - m)) ** 2)[:, None]).T @ X
    V = n / (n - 1.0) * np.linalg.solve(A, np.linalg.solve(A, M).T).T
    se = np.sqrt(np.diag(V))
    assert got["(Intercept)"][0] == pytest.approx(round(beta[0], 6), abs=2e-6)
    assert got["x"][0] == pytest.approx(round(beta[1], 6), abs=2e-6)
    assert got["(Intercept)"][1] == pytest.approx(se[0], rel=1e-4)
    assert got["x"][1] == pytest.approx(se[1], rel=1e-4)


def test_svyglm_rejects_unknown_family(spark):
    df = spark.createDataFrame([(1.0, 1.0, 1.0)], "x double, y double, w double")
    with pytest.raises(ValueError, match="poisson"):
        svyglm(SurveyDesign(df=df, weight_col="w"), "y ~ x", model_type="gamma")
